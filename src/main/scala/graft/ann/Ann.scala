package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** (neighbor, cos) pair — the unit flowing through the top-k aggregator. */
case class ScoredNeighbor(neighbor: Long, cos: Double)

/**
 * Bounded top-k as a real Spark `Aggregator`: each map task keeps a
 * k-element best-list per group (partial aggregation), merges combine
 * lists — the shuffle carries at most k rows per (group, map task)
 * instead of the full candidate set. This replaces the
 * `row_number().over(partitionBy(qid))` shape, which funnels N×Q rows
 * into Q reducer tasks — correct locally, a skew bomb at 100 TB.
 * Order: cos desc, then neighbor asc (deterministic ties).
 */
class TopKAggregator(k: Int) extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  // NaN (a zero vector's 0/0 cosine) sorts as worst, not incomparable:
  // with raw `>` a NaN at buf.last makes `better(x, last)` false for
  // every x, freezing the buffer and dropping real neighbors in
  // arrival order. Mapping NaN -> -Inf keeps the order total.
  private def key(c: Double): Double = if (c.isNaN) Double.NegativeInfinity else c
  private def better(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
    key(a.cos) > key(b.cos) || (key(a.cos) == key(b.cos) && a.neighbor < b.neighbor)
  private def insert(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] = {
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(x, b)) match { case -1 => buf.size; case n => n }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }
  override def zero: Seq[ScoredNeighbor] = Vector.empty
  override def reduce(b: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] = insert(b, a)
  override def merge(x: Seq[ScoredNeighbor], y: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    y.foldLeft(x)(insert)
  override def finish(b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = b
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNeighbor]]()
}

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 *  - bruteForceTopK: exact baseline — broadcast the (small) query set,
 *    score every corpus vector (codegen'd zip_with/aggregate dot
 *    product), partial top-k heaps per query (TopKAggregator).
 *  - lshTopK: scale path — random-hyperplane bucket join with
 *    MULTI-PROBE (the query probes its own bucket plus all buckets at
 *    hamming distance 1), exact re-rank within buckets. Bounded
 *    candidate sets instead of a full scan.
 *  - ivfTopK: IVF-style — `cells` centroids picked deterministically
 *    (smallest multiplicative hash of the id; the reference analog of a
 *    trained coarse quantizer), every vector assigned to its nearest
 *    cell by a PURE PROJECTION argmin over the broadcast-as-literal
 *    centroids (no join, no window, no shuffle for assignment);
 *    queries probe `nprobe` cells.
 *
 * All hyperplanes are deterministic literals (splitmix64), so results
 * are reproducible across engines — the DuckDB oracle recomputes the
 * same signatures from the same constants.
 */
object Ann {

  /** splitmix64 — deterministic plane components (one shared mixer). */
  private def splitmix64(seed: Long): Long = graft.functions.TextExprs.mix64(seed)

  /** Deterministic pseudo-random hyperplanes in [-1, 1]^dim. */
  def planeMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes)(p =>
      Array.tabulate(dim)(i => splitmix64(p.toLong * 100003L + i).toDouble / Long.MaxValue))

  /** Embedding dimensionality from the first non-empty vector; fails
    * with a clear message on an empty/all-null table instead of a
    * NoSuchElementException or NPE from `head()`. `d > 0` (not >= 0)
    * so a corrupt empty-array row can't yield dim=0 — zero-length
    * planes would give every vector the same all-zero signature and
    * collapse the banded candidate join into a quadratic self-join. */
  private[graft] def probeDim(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol)).as("d")).where(col("d") > 0).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(
        throw new IllegalArgumentException(
          s"cannot infer embedding dimension: no non-empty '$vecCol' rows"))

  /** cosine(a.v, b.v) — native loop, fold-order-identical to the
    * zip_with/aggregate form (and DuckDB's list_dot_product). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** Sign-pattern signature over literal hyperplanes (native loop). */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column =
    graft.functions.VectorExprs.planeSig(v, planes)

  /** Scored candidates -> per-query top-k rows (qid, rank, neighbor, cos)
    * via the partial-aggregating TopKAggregator. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    scored.groupBy(col("qid"))
      .agg(agg(col("neighbor"), col("cos")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor").as("neighbor"), col("col.cos").as("cos"))
  }

  /**
   * Exact top-k cosine neighbors for each query id. The query set is
   * broadcast (it is small); ranking ties break by neighbor id so the
   * result is deterministic.
   */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = v.where(col("id").isin(queryIds: _*))
      .withColumnRenamed("id", "qid").withColumnRenamed("v", "qv")
    val scored = v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    topK(scored, k)
  }

  /**
   * LSH-bucketed ANN with multi-probe: the query probes its own bucket
   * and every bucket at hamming distance 1 (planes+1 probes), exact
   * re-rank within the probed candidates.
   */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, planes: Int = 6,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val dim = probeDim(emb, vecCol)
    val pm = planeMatrix(planes, dim)
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("sig", lshSignature(col("v"), pm))
    val probeSigs = array(
      (col("sig") +: (0 until planes).map(i => col("sig").bitwiseXOR(lit(1L << i)))): _*)
    val q = v.where(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"), explode(probeSigs).as("psig"))
    val scored = v.join(broadcast(q), col("sig") === col("psig") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    topK(scored, k)
  }

  /**
   * IVF-style ANN. Centroid selection (smallest multiplicative hash of
   * id, tie by id) is a tiny deterministic driver action — the analog
   * of holding a trained coarse quantizer driver-side; assignment is a
   * pure argmin projection over the literal centroids.
   */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              cells: Int = 16, nprobe: Int = 2,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val centroids: Array[(Long, Array[Double])] = v
      // Knuth multiplicative hash in decimal(38,0): a plain long multiply
      // overflows (ANSI ArithmeticException) for ids above ~3.47e9 —
      // 64-bit content hashes and snowflake ids are routine at scale
      .withColumn("hk",
        col("id").cast("decimal(38,0)") * lit(2654435761L) % lit(4294967296L))
      .orderBy(col("hk"), col("id")).limit(cells)
      .select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // assignment: argmin over the literal centroid array — no shuffle.
    // Native one-loop-per-row expression; the interpreted
    // zip_with/aggregate form this replaces evaluated cells×dim boxed
    // lambdas per corpus row (~30× slower, per the TextExprs header).
    import graft.functions.VectorExprs.nearestCentroids
    val assigned = v.withColumn("cid",
      nearestCentroids(col("v"), centroids, 1).getItem(0))
    // queries probe their nprobe nearest cells (sorted-prefix projection)
    val probes = assigned.where(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"),
        explode(nearestCentroids(col("v"), centroids, nprobe)).as("pcid"))
    val scored = assigned.join(broadcast(probes),
        col("cid") === col("pcid") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    topK(scored, k)
  }
}
