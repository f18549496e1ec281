package graft.engine

import graft.geo.Geo
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The graft input: an Iceberg-style table of interleaved text+media
 * documents `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
 *
 * This sandbox has no external corpus, so the table is SYNTHESIZED
 * deterministically (pure column arithmetic, seed-free) from the
 * driver-provided TPC-H-ish parquet at the given scale factor:
 *
 *   - point docs  "doc_<k>"  from `orders`:  lon/lat derived from
 *     o_orderkey by fixed modular arithmetic (mirrorable 1:1 in the
 *     DuckDB oracle SQL);
 *   - line docs   "line_<k>" from `orders x lineitem`: vertices ordered
 *     by l_linenumber (this doubles as the way<-node ordered-join
 *     fixture);
 *   - polygon docs "adm_<i>" from `nation`: a 5x5 grid of rectangles
 *     covering the world (the broadcastable admin layer for the PIP
 *     join).
 *
 * Every doc interleaves text + geom + media spans; the per-row
 * invariant `span_sig` (order-sensitive hash of (kind, text, media_ref)
 * in offset order) is computed once at ingest and must be reproducible
 * after any shuffle.
 */
object Docs {

  /** Parallelism for synthesis scans: the driver test parquet is one
    * row group (unsplittable), so fan the scan out explicitly before
    * the span-construction work. 0 = leave as scanned. */
  @volatile var synthParallelism: Int = 32
  private def par(df: DataFrame): DataFrame =
    if (synthParallelism > 0) df.repartition(synthParallelism) else df

  // lon/lat derivations — keep in sync with the oracle SQL in SparkEntry
  def lonExpr(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (key * 9973 % 36000) / 100.0 - 180.0
  def latExpr(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (key * 7919 % 17000) / 100.0 - 85.0
  val LonSql = "((k * 9973) % 36000) / 100.0 - 180.0"
  val LatSql = "((k * 7919) % 17000) / 100.0 - 85.0"

  private def spanStruct(kind: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
                         mediaRef: org.apache.spark.sql.Column, offset: Int) =
    struct(kind.as("kind"), text.as("text"), mediaRef.as("media_ref"), lit(offset).as("offset"))

  /** Point-bearing docs from `orders`. `variant` shifts the key space
    * so a benchmark corpus can be scaled to any multiple of the base
    * tables, deterministically ("doc_" becomes "docV_"). */
  def pointDocs(spark: SparkSession, sfDir: String, variant: Int = 0): DataFrame = {
    val o = par(spark.read.parquet(s"$sfDir/orders.parquet"))
    val key = col("o_orderkey") + lit(variant * 100000007L)
    val lon = lonExpr(key)
    val lat = latExpr(key)
    val prefix = if (variant == 0) "doc_" else s"doc${variant}_"
    o.select(
      concat(lit(prefix), col("o_orderkey")).as("doc_id"),
      array(
        spanStruct(lit("text"),
          concat(lit("order "), col("o_orderstatus"), lit(" "), col("o_orderpriority")),
          lit(null).cast("string"), 0),
        spanStruct(lit("geom"),
          concat(lit("POINT ("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")")),
          lit(null).cast("string"), 1),
        spanStruct(lit("media"), lit(null).cast("string"),
          concat(lit("media://img/"), (col("o_orderkey") % 97).cast("string")), 2)
      ).as("spans"))
  }

  /** Line-bearing docs from `orders x lineitem` (vertices ordered by
    * l_linenumber — the ordered large-large join fixture). */
  def lineDocs(spark: SparkSession, sfDir: String, variant: Int = 0): DataFrame = {
    val li = par(spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val key = col("l_orderkey") + lit(variant * 100000007L)
    val lon = lonExpr(key) + col("l_linenumber") * 0.003
    val lat = latExpr(key) + (col("l_linenumber") * 13 % 5) * 0.002
    li.select(col("l_orderkey"), col("l_linenumber"),
        concat(lon.cast("string"), lit(" "), lat.cast("string")).as("pt"))
      .groupBy(col("l_orderkey"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("l_linenumber"), col("pt")))),
        x => x.getField("pt")), ", ").as("pts"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(
        concat(lit(if (variant == 0) "line_" else s"line${variant}_"), col("l_orderkey")).as("doc_id"),
        array(
          spanStruct(lit("text"), concat(lit("route "), col("l_orderkey")), lit(null).cast("string"), 0),
          spanStruct(lit("geom"), concat(lit("LINESTRING ("), col("pts"), lit(")")), lit(null).cast("string"), 1),
          spanStruct(lit("media"), lit(null).cast("string"),
            concat(lit("media://trk/"), (col("l_orderkey") % 89).cast("string")), 2)
        ).as("spans"))
  }

  /** 5x5 grid of admin rectangles from `nation` (world-covering). */
  def polygonDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    val colIdx = col("n_nationkey") % 5
    val rowIdx = floor(col("n_nationkey") / 5)
    val xmin = colIdx * 72.0 - 180.0
    val xmax = xmin + 72.0
    val ymin = rowIdx * 34.0 - 85.0
    val ymax = ymin + 34.0
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    n.select(
      concat(lit("adm_"), col("n_nationkey")).as("doc_id"),
      array(
        spanStruct(lit("text"), concat(lit("admin "), col("n_name")), lit(null).cast("string"), 0),
        spanStruct(lit("geom"),
          concat(lit("POLYGON (("),
            s(xmin), lit(" "), s(ymin), lit(", "),
            s(xmax), lit(" "), s(ymin), lit(", "),
            s(xmax), lit(" "), s(ymax), lit(", "),
            s(xmin), lit(" "), s(ymax), lit(", "),
            s(xmin), lit(" "), s(ymin), lit("))")),
          lit(null).cast("string"), 1),
        spanStruct(lit("media"), lit(null).cast("string"),
          concat(lit("media://adm/"), s(col("n_nationkey"))), 2)
      ).as("spans"))
  }

  /** The full interleaved docs table; `mult` > 1 scales the corpus by
    * unioning deterministic key-shifted variants (benchmark sizing). */
  def docs(spark: SparkSession, sfDir: String, mult: Int = 1): DataFrame = {
    val parts =
      (0 until mult).map(v => pointDocs(spark, sfDir, v)) ++
        (0 until mult).map(v => lineDocs(spark, sfDir, v)) :+
        polygonDocs(spark, sfDir)
    parts.reduce(_.unionByName(_))
  }

  /**
   * Order-sensitive span-sequence signature: xxhash64 over the spans in
   * `offset` order — the per-row invariant carried through the whole
   * pipeline. Pure column expression (codegen'd, no UDF).
   */
  def spanSigCol: org.apache.spark.sql.Column =
    aggregate(
      array_sort(col("spans"),
        (l, r) => (l.getField("offset") - r.getField("offset")).cast("int")),
      lit(-3750763034362895579L), // FNV-ish seed
      (acc, s) => xxhash64(acc, s.getField("kind"), s.getField("text"),
        s.getField("media_ref"), s.getField("offset")))

  /**
   * Bench-session fixture materialization: when set (by `graft.Bench`
   * only), each synthesized input is written ONCE as splittable
   * parquet under this dir and read back by every accessor — timed
   * queries then measure the operator over a real table scan instead
   * of re-running the synthesis pipeline (the same way the flagship
   * excludes docs materialization and the reference excludes download
   * time). The gate/Verify path leaves this unset, so accessors build
   * the synthesis plans inline; the rows are identical either way.
   */
  /** Version stamp for synthesized fixture output: bump whenever the
    * synthesis logic changes so tmpfs caches from older binaries are
    * invalidated instead of silently reused (Bench.ensureFixtureVersion). */
  val SynthVersion = "r5-001"

  @volatile var fixtureDir: Option[String] = None

  private def materialized(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    fixtureDir match {
      case Some(base) =>
        val out = s"$base/$key"
        synchronized {
          if (!new java.io.File(out, "_SUCCESS").exists())
            build.repartition(32).write.mode("overwrite").parquet(out)
        }
        spark.read.parquet(out)
      case None => build
    }

  /** The docs table, via the fixture cache when enabled. */
  def docsTable(spark: SparkSession, sfDir: String): DataFrame =
    materialized(spark, s"docs-${new java.io.File(sfDir).getName}")(docs(spark, sfDir))

  /** Point-layer SourceFeatures, via the fixture cache when enabled. */
  def pointFeatures(spark: SparkSession, sfDir: String): Dataset[SourceFeature] = {
    import spark.implicits._
    materialized(spark, s"pointfeat-${new java.io.File(sfDir).getName}")(
      sourceFeatures(pointDocs(spark, sfDir)).toDF()).as[SourceFeature]
  }

  /** Line-layer SourceFeatures, via the fixture cache when enabled. */
  def lineFeatures(spark: SparkSession, sfDir: String): Dataset[SourceFeature] = {
    import spark.implicits._
    materialized(spark, s"linefeat-${new java.io.File(sfDir).getName}")(
      sourceFeatures(lineDocs(spark, sfDir)).toDF()).as[SourceFeature]
  }

  /** docs -> typed SourceFeature dataset (one row per geom span). */
  def sourceFeatures(docs: DataFrame): Dataset[SourceFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withSig = docs
      .withColumn("span_sig", spanSigCol)
      .withColumn("first_text",
        try_element_at(filter(col("spans"), s => s.getField("kind") === "text"), lit(1)).getField("text"))
      .withColumn("media_refs",
        array_join(transform(filter(col("spans"), s => s.getField("kind") === "media"),
          s => s.getField("media_ref")), ","))
      .select(col("doc_id"), col("span_sig"), col("first_text"), col("media_refs"),
        explode(filter(col("spans"), s => s.getField("kind") === "geom")).as("gspan"))
      .select(col("doc_id"), col("span_sig"), col("first_text"), col("media_refs"),
        col("gspan.text").as("wkt"))

    withSig.as[(String, Long, String, String, String)].map {
      case (docId, sig, text, mediaRefs, wkt) =>
        val g = Geo.fromWktOrNull(wkt)
        SourceFeature(
          doc_id = docId,
          source = docId.takeWhile(_ != '_'),
          geom = if (g == null) Array.empty[Byte] else Geo.toWkb(g),
          tags = Map(
            "text" -> Option(text).getOrElse(""),
            "media" -> Option(mediaRefs).getOrElse("")),
          span_sig = sig)
    }.filter(_.geom.nonEmpty)
  }
}
