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

  def transitiveClosure(memberships: DataFrame, maxDepth: Int = 10): DataFrame = {
    val base = memberships.select(
      col("member_id"), col("relation_id").as("ancestor_id"), lit(1).as("depth"))
      .distinct()
      .localCheckpoint(eager = true)
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
