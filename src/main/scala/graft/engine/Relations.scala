package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Relation-membership closure (reference `OsmReader.java:563-607`:
 * super-relations resolved recursively with a cycle guard): given
 * memberships (member_id, relation_id), compute every (member_id,
 * ancestor relation_id, depth) pair, where `depth` is A path length
 * witnessing reachability (minimal among paths seen when the pair is
 * first discovered).
 *
 * Spark shape: PATH DOUBLING ("smart" transitive closure) — each
 * round joins the newly-discovered frontier against the closure, so
 * reachable depth doubles per round and a depth-d nest
 * closes in O(log d) rounds instead of d frontier expansions (the
 * same log-round argument as the large-star/small-star components in
 * [[graft.dedup.Dedup]]). A deliberate 25-relation cycle therefore
 * costs 5 self-joins, not 25 Spark jobs. Cycles terminate via the
 * known-pair anti-join + the `maxDepth` bound; per-round eager
 * `localCheckpoint` keeps the lineage flat. The fixpoint test is an
 * emptiness probe, not a count.
 *
 * `maxDepth` is a TERMINATION FUSE, not an output filter: rounds stop
 * once doubling reaches it, so pairs up to the next power of two past
 * it may be included (e.g. maxDepth=10 can emit depth-16 pairs from
 * the final 8+8 composition). Callers use the closure for
 * reachability; depth is a witness, not a shortest-path guarantee.
 */
object Relations {

  /** Edge-count bound for the driver-local fast path: below it the
    * closure is computed with the SAME doubling algorithm in one pass
    * on the driver (identical output), skipping ~4 Spark jobs per
    * round. Relation-membership graphs are ~10^6 edges at planet
    * scale, so the distributed loop stays the >threshold path. */
  val LocalSolveMaxEdges: Long = 1L << 21

  /** Pair budget for the local solve: if the in-memory closure grows
    * past this the local attempt aborts and the distributed loop runs
    * instead (deep chains can blow up closure size quadratically). */
  val LocalSolveMaxPairs: Int = 1 << 25

  private class LocalBudgetExceeded extends RuntimeException

  /** Minimal open-addressing (packed-pair long) -> (int depth) map —
    * the local solve is hot enough that boxed Scala maps cost seconds
    * at ~10^6 pairs (the reference hand-rolls its long maps for the
    * same reason). Linear probing, power-of-two capacity. */
  private final class PairDepthMap(initialCap: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCap) * 2 - 1) * 2
    private var mask = cap - 1
    private var ks = new Array[Long](cap)
    private var ds = new Array[Int](cap)
    private var st = new Array[Boolean](cap)
    var size = 0
    private def slot(k: Long): Int = {
      var i = ((k * -7046029254386353131L) >>> 40).toInt & mask
      while (st(i) && ks(i) != k) i = (i + 1) & mask
      i
    }
    def get(k: Long): Int = { val i = slot(k); if (st(i)) ds(i) else Int.MinValue }
    def contains(k: Long): Boolean = st(slot(k))
    /** insert or keep the minimum depth */
    def putMin(k: Long, d: Int): Unit = {
      val i = slot(k)
      if (!st(i)) { st(i) = true; ks(i) = k; ds(i) = d; size += 1; maybeGrow() }
      else if (d < ds(i)) ds(i) = d
    }
    private def maybeGrow(): Unit = if (size * 5 > cap * 3) {
      val (ok, od, os) = (ks, ds, st)
      cap *= 2; mask = cap - 1; size = 0
      ks = new Array[Long](cap); ds = new Array[Int](cap); st = new Array[Boolean](cap)
      var i = 0
      while (i < os.length) { if (os(i)) putMin(ok(i), od(i)); i += 1 }
    }
    def foreach(f: (Long, Int) => Unit): Unit = {
      var i = 0
      while (i < st.length) { if (st(i)) f(ks(i), ds(i)); i += 1 }
    }
  }

  /**
   * Driver-local replica of the distributed doubling loop — SAME
   * rounds, SAME min-depth merge, SAME termination, so the emitted
   * (member_id, ancestor_id, depth) set is identical row for row.
   * IDs are densely remapped so a pair packs into one long key.
   */
  private def localClosure(edges: Array[(Long, Long)],
                           maxDepth: Int): (Array[Long], Array[Long], Array[Int]) = {
    // dense remap: sorted unique ids, binary-search lookup (no boxing)
    val ids = {
      val all = new Array[Long](edges.length * 2)
      var i = 0
      while (i < edges.length) {
        all(2 * i) = edges(i)._1; all(2 * i + 1) = edges(i)._2; i += 1
      }
      java.util.Arrays.sort(all)
      var n = 0
      i = 0
      while (i < all.length) {
        if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(all, n)
    }
    def dense(x: Long): Long = java.util.Arrays.binarySearch(ids, x).toLong
    def pack(u: Long, v: Long): Long = (u << 32) | v

    val closure = new PairDepthMap(edges.length * 4)
    edges.foreach { case (m, a) => closure.putMin(pack(dense(m), dense(a)), 1) }
    var frontierK = new Array[Long](closure.size)
    var frontierD = new Array[Int](closure.size)
    var frontierN = 0
    closure.foreach { (k, d) => frontierK(frontierN) = k; frontierD(frontierN) = d; frontierN += 1 }

    var reached = 1L
    var done = false
    while (!done && reached < maxDepth) {
      // CSR adjacency member -> (ancestor, depth) over the closure,
      // rebuilt per round (the distributed loop re-reads closure too)
      val counts = new Array[Int](ids.length + 1)
      closure.foreach { (k, _) => counts(((k >>> 32) + 1).toInt) += 1 }
      var i = 1
      while (i <= ids.length) { counts(i) += counts(i - 1); i += 1 }
      val adjA = new Array[Int](closure.size)
      val adjD = new Array[Int](closure.size)
      val fill = java.util.Arrays.copyOf(counts, counts.length)
      closure.foreach { (k, d) =>
        val u = (k >>> 32).toInt
        adjA(fill(u)) = (k & 0xffffffffL).toInt; adjD(fill(u)) = d; fill(u) += 1
      }
      val next = new PairDepthMap(math.max(1024, frontierN))
      i = 0
      while (i < frontierN) {
        val m = frontierK(i) >>> 32
        val a = (frontierK(i) & 0xffffffffL).toInt
        val d = frontierD(i)
        var j = counts(a)
        val end = counts(a + 1)
        while (j < end) {
          val k2 = (m << 32) | adjA(j)
          if (!closure.contains(k2)) next.putMin(k2, d + adjD(j))
          j += 1
        }
        i += 1
      }
      if (next.size == 0) done = true
      else {
        if (closure.size.toLong + next.size > LocalSolveMaxPairs) throw new LocalBudgetExceeded
        if (frontierK.length < next.size) {
          frontierK = new Array[Long](next.size); frontierD = new Array[Int](next.size)
        }
        frontierN = 0
        next.foreach { (k, d) =>
          closure.putMin(k, d)
          frontierK(frontierN) = k; frontierD(frontierN) = d; frontierN += 1
        }
        reached *= 2
      }
    }
    // deterministic order: sort by packed dense key == (member rank,
    // ancestor rank)
    val out = new Array[Long](closure.size)
    var n = 0
    closure.foreach { (k, _) => out(n) = k; n += 1 }
    java.util.Arrays.sort(out)
    val ms = new Array[Long](n); val as = new Array[Long](n); val dsOut = new Array[Int](n)
    var i = 0
    while (i < n) {
      ms(i) = ids((out(i) >>> 32).toInt)
      as(i) = ids((out(i) & 0xffffffffL).toInt)
      dsOut(i) = closure.get(out(i))
      i += 1
    }
    (ms, as, dsOut)
  }

  def transitiveClosure(memberships: DataFrame, maxDepth: Int = 10,
                        localSolveMaxEdges: Long = LocalSolveMaxEdges): DataFrame = {
    val spark = memberships.sparkSession
    import spark.implicits._
    val base = memberships.select(
      col("member_id"), col("relation_id").as("ancestor_id"), lit(1).as("depth"))
      .distinct()
      .localCheckpoint(eager = true)
    // small-graph fast path (same adaptive pattern as
    // [[graft.dedup.Dedup.duplicateClusters]]): one count over the
    // checkpointed base decides the regime; the local solve replays the
    // identical doubling rounds, so output matches the distributed
    // loop bit for bit. Budget overrun falls through to the loop.
    if (base.count() <= localSolveMaxEdges) {
      val edges = base
        .select(col("member_id").cast("long"), col("ancestor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      try {
        val (ms, as, ds) = localClosure(edges, maxDepth)
        // ship the primitive arrays ONCE via broadcast and slice them
        // in tasks: parallelize(Seq[tuple]) would Java-serialize ~40 MB
        // of boxed tuples into the task binaries and encode rows
        // serially on the driver
        val n = ms.length
        val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
          n / 4096 + 1))
        val bcArrs = spark.sparkContext.broadcast((ms, as, ds))
        val rdd = spark.sparkContext.parallelize(0 until slices, slices).flatMap { s =>
          val (bm, ba, bd) = bcArrs.value
          val start = (s.toLong * n / slices).toInt
          val end = ((s + 1).toLong * n / slices).toInt
          Iterator.range(start, end).map(i => (bm(i), ba(i), bd(i)))
        }
        // cast back to the caller's id/depth dtypes so both regimes
        // return byte-identical schemas
        val sch = base.schema
        return spark.createDataset(rdd).toDF("member_id", "ancestor_id", "depth")
          .select(col("member_id").cast(sch(0).dataType),
            col("ancestor_id").cast(sch(1).dataType),
            col("depth").cast(sch(2).dataType))
      } catch { case _: LocalBudgetExceeded => () }
    }
    var closure = base
    var frontier = base
    var reached = 1L
    var done = false
    while (!done && reached < maxDepth) {
      // "smart" doubling: join the FRONTIER (pairs first discovered
      // last round) against the closure. Complete for doubling — a
      // shortest path of length L in (d, 2d] splits at its midpoint
      // into a prefix of exactly ceil(L/2) in (d/2, d] (frontier) and
      // a suffix <= d (closure) — and the frontier collapses to the
      // few deep pairs once the shallow part of the graph closes, so
      // late rounds join a tiny side instead of closure x closure.
      val m = closure.select(col("member_id").as("m_member"),
        col("ancestor_id").as("m_anc"), col("depth").as("m_depth"))
      val known = closure.select(col("member_id").as("km"), col("ancestor_id").as("ka"))
      val next = frontier
        .join(m, col("ancestor_id") === col("m_member"))
        .select(col("member_id").as("nm"), col("m_anc").as("na"),
          (col("depth") + col("m_depth")).as("nd"))
        .groupBy(col("nm"), col("na"))
        .agg(min(col("nd")).as("nd"))
        // cycle guard: drop pairs already known at ANY depth
        .join(known, col("nm") === col("km") && col("na") === col("ka"), "left_anti")
        .select(col("nm").as("member_id"), col("na").as("ancestor_id"), col("nd").as("depth"))
        .localCheckpoint(eager = true)
      if (next.isEmpty) done = true
      else {
        // closure is read twice next round (join side + anti guard) —
        // keep it materialized, lineage flat
        closure = closure.unionByName(next).localCheckpoint(eager = true)
        frontier = next
        reached *= 2
      }
    }
    closure
  }
}
