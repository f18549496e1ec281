package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 *  - bruteForceTopK: exact baseline — broadcast the (small) query set,
 *    score every corpus vector (codegen'd zip_with/aggregate dot
 *    product), window top-k per query. One pass over the corpus, no
 *    shuffle of the corpus itself.
 *  - lshTopK: scale path — random-hyperplane bucket join (query probes
 *    its own bucket), exact re-rank within buckets. Bounded candidate
 *    sets instead of a full scan; recall trades with `planes`.
 *  - ivfTopK: IVF-style — k centroid "cells" picked deterministically
 *    from the corpus (hash-sampled seeds), every vector assigned to its
 *    nearest cell (broadcast centroids), queries probe `nprobe` cells.
 */
object Ann {

  /** cosine(a.v, b.v) over array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /**
   * Exact top-k cosine neighbors for each query id. The query set is
   * broadcast (it is small); ranking ties break by neighbor id so the
   * result is deterministic.
   */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = v.where(col("id").isin(queryIds: _*))
      .withColumnRenamed("id", "qid").withColumnRenamed("v", "qv")
    val scored = v.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"), col("cos"))
  }

  /** Random-hyperplane signature (deterministic pseudo-planes). */
  def lshSignature(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * ((xxhash64(lit(p), i) % 1000001L).cast("double") / 1000000.0)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: probe the query's bucket, exact re-rank. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, planes: Int = 6,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("sig", lshSignature(col("v"), planes))
    val q = v.where(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"), col("sig").as("qsig"))
    val scored = v.join(broadcast(q), col("sig") === col("qsig") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"), col("cos"))
  }

  /**
   * IVF-style ANN: `cells` centroids = the vectors whose ids hash
   * smallest (deterministic sample); assignment = argmin centroid
   * distance (broadcast); queries probe `nprobe` nearest cells.
   */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              cells: Int = 16, nprobe: Int = 2,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val centroids = broadcast(
      v.withColumn("hk", xxhash64(col("id")))
        .orderBy(col("hk")).limit(cells)
        .select(col("id").as("cid"), col("v").as("cv")))
    def sqDist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)
    // assign every vector to its nearest cell
    val wAssign = Window.partitionBy(col("id")).orderBy(col("d"), col("cid"))
    val assigned = v.join(centroids)
      .select(col("id"), col("v"), col("cid"), sqDist(col("v"), col("cv")).as("d"))
      .withColumn("rn", row_number().over(wAssign)).where(col("rn") === 1)
      .select(col("id"), col("v"), col("cid"))
    // queries probe their nprobe nearest cells
    val q = assigned.where(col("id").isin(queryIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("cid"))
    val probes = q.join(centroids)
      .select(col("qid"), col("qv"), col("cid"), sqDist(col("qv"), col("cv")).as("d"))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val scored = assigned.join(broadcast(probes),
        assigned("cid") === probes("cid") && col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("neighbor"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor"), col("cos"))
  }
}
