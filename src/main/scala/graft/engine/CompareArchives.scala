package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Archive diff + verification utilities — the operational tooling for
 * validating a build against a previous one (reference
 * `util/CompareArchives.java` and `mbtiles/Verify.java`), re-expressed
 * Spark-first: where the reference walks two archives tile-by-tile on
 * one thread, this joins two tile DataFrames on the tile address —
 * a distributed full-outer join that scales to planet archives (the
 * two sides shuffle once on (z,x,y); per-tile byte/layer comparison
 * runs map-side after the join).
 *
 * Input shape: any DataFrame with (z, x, y, bytes) — the native
 * `Dataset[TileBytes]`, `MbtilesReader.read`, or a files-archive scan
 * all adapt trivially.
 */
object CompareArchives {

  case class TileDiff(z: Int, x: Int, y: Int, issue: String)
  case class Result(total1: Long, total2: Long, matching: Long,
                    diffsByIssue: Map[String, Long],
                    diffsByZoom: Map[Int, Long],
                    sampleDiffs: Seq[TileDiff]) {
    def ok: Boolean = diffsByIssue.isEmpty
    def report: String = {
      val header = s"archive1=$total1 tiles, archive2=$total2 tiles, matching=$matching"
      if (ok) s"$header — archives identical"
      else header + diffsByIssue.toSeq.sortBy(_._1)
        .map { case (k, n) => s"\n  $n x $k" }.mkString +
        sampleDiffs.take(10).map(d => s"\n  e.g. ${d.z}/${d.x}/${d.y}: ${d.issue}").mkString
    }
  }

  /** Per-tile comparison after the join: byte equality first (cheap),
    * then decompressed bytes, then decoded per-layer feature lists
    * (reference `CompareArchives.java:201-423`). Returns issues. */
  private def compareTile(b1: Array[Byte], b2: Array[Byte], gzipped: Boolean): Seq[String] = {
    if (java.util.Arrays.equals(b1, b2)) return Nil
    val (d1, d2) =
      if (gzipped) (Mvt.gunzip(b1), Mvt.gunzip(b2))
      else (b1, b2)
    if (gzipped && java.util.Arrays.equals(d1, d2)) return Seq("same contents, different compression")
    val f1 = try Mvt.decodeTile(d1) catch { case _: Exception => return Seq("archive 1 tile undecodable") }
    val f2 = try Mvt.decodeTile(d2) catch { case _: Exception => return Seq("archive 2 tile undecodable") }
    val l1 = f1.groupBy(_.layer)
    val l2 = f2.groupBy(_.layer)
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    (l1.keySet -- l2.keySet).toSeq.sorted.foreach(l => issues += s"archive 2 missing layer $l")
    (l2.keySet -- l1.keySet).toSeq.sorted.foreach(l => issues += s"archive 1 missing layer $l")
    (l1.keySet intersect l2.keySet).toSeq.sorted.foreach { l =>
      val (a, b) = (l1(l), l2(l))
      if (a.size != b.size) issues += s"layer $l feature count ${a.size} != ${b.size}"
      else if (a.map(f => (f.id, f.geomType, f.attrs)) != b.map(f => (f.id, f.geomType, f.attrs)))
        issues += s"layer $l different features"
    }
    if (issues.isEmpty) Seq("different contents") else issues.toSeq
  }

  /**
   * Compare two archives as (z, x, y, bytes) DataFrames. One shuffle
   * (the full-outer join on the tile address); `maxSamples` concrete
   * diffs are collected for the report, counts are exact.
   */
  def compare(a: DataFrame, b: DataFrame, gzipped: Boolean = false,
              maxSamples: Int = 100): Result = {
    val spark = a.sparkSession
    import spark.implicits._
    val a2 = a.select(col("z").cast("int"), col("x").cast("int"), col("y").cast("int"),
      col("bytes")).toDF("z", "x", "y", "bytes1")
    val b2 = b.select(col("z").cast("int"), col("x").cast("int"), col("y").cast("int"),
      col("bytes")).toDF("z", "x", "y", "bytes2")
    val joined = a2.join(b2, Seq("z", "x", "y"), "full_outer")
    val diffs: Dataset[TileDiff] = joined.flatMap { r =>
      val z = r.getInt(0); val x = r.getInt(1); val y = r.getInt(2)
      val b1 = r.getAs[Array[Byte]]("bytes1")
      val b2v = r.getAs[Array[Byte]]("bytes2")
      val issues =
        if (b1 == null) Seq("archive 1 missing tile")
        else if (b2v == null) Seq("archive 2 missing tile")
        else compareTile(b1, b2v, gzipped)
      issues.map(TileDiff(z, x, y, _))
    }
    diffs.persist()
    try {
      val byIssue = diffs.groupBy(col("issue")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val byZoom = diffs.groupBy(col("z")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val samples = diffs.take(maxSamples).toSeq
      val t1 = a.count(); val t2 = b.count()
      val totalAddresses = joined.count()
      val presentInBoth = t1 + t2 - totalAddresses
      val diffTilesBothPresent = diffs
        .where(!col("issue").isin("archive 1 missing tile", "archive 2 missing tile"))
        .select(col("z"), col("x"), col("y")).distinct().count()
      Result(t1, t2, presentInBoth - diffTilesBothPresent, byIssue, byZoom, samples)
    } finally { diffs.unpersist(); () }
  }

  // ---------------- verification (mbtiles/Verify.java analog) ----------------

  case class Check(name: String, error: Option[String]) { def ok: Boolean = error.isEmpty }
  case class Verification(checks: Seq[Check]) {
    def ok: Boolean = checks.forall(_.ok)
    def report: String = checks.map(c =>
      s"${if (c.ok) "ok  " else "FAIL"} ${c.name}${c.error.map(": " + _).getOrElse("")}").mkString("\n")
  }

  /** Basic-structure + min-count verification of an MBTiles archive
    * (reference `Verify.java:191-215` checkBasicStructure +
    * checkMinFeatureCount): metadata keys, at least one tile, tile
    * addresses within zoom bounds, and caller-supplied minimum feature
    * counts per (layer, zoom). */
  def verifyMbtiles(spark: org.apache.spark.sql.SparkSession, path: String,
                    minFeatureCounts: Seq[(String, Int, Int)] = Nil,
                    gzipped: Boolean = false): Verification = {
    val checks = scala.collection.mutable.ArrayBuffer.empty[Check]
    val meta = try graft.sources.MbtilesReader.metadata(path,
      spark.sparkContext.hadoopConfiguration)
    catch { case e: Exception =>
      return Verification(Seq(Check("readable", Some(e.toString))))
    }
    checks += Check("metadata has name", if (meta.contains("name")) None else Some("missing"))
    checks += Check("metadata has format", if (meta.contains("format")) None else Some("missing"))
    val tiles = graft.sources.MbtilesReader.read(spark, path)
    tiles.persist()
    try {
      val n = tiles.count()
      checks += Check("has at least one tile", if (n > 0) None else Some("empty archive"))
      val side = pow(lit(2.0), col("z")).cast("long")
      val outOfBounds = tiles.where(
        col("x") < 0 || col("y") < 0 || col("x") >= side || col("y") >= side)
        .count()
      checks += Check("tile addresses within zoom bounds",
        if (outOfBounds == 0) None else Some(s"$outOfBounds out-of-bounds tiles"))
      minFeatureCounts.foreach { case (layer, zoom, minCount) =>
        // layer counting is y-orientation-agnostic
        val cnt = tiles.where(col("z") === zoom)
          .select(col("bytes")).as[Array[Byte]](org.apache.spark.sql.Encoders.BINARY)
          .mapPartitions { it =>
            it.map { b =>
              val raw = if (gzipped) Mvt.gunzip(b) else b
              Mvt.decodeTile(raw).count(_.layer == layer).toLong
            }
          }(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("c").agg(coalesce(sum(col("c")), lit(0L))).collect()(0).getLong(0)
        checks += Check(s"layer $layer z$zoom has >= $minCount features",
          if (cnt >= minCount) None else Some(s"found $cnt"))
      }
    } finally { tiles.unpersist(); () }
    Verification(checks.toSeq)
  }
}
