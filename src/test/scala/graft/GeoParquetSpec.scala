package graft

import graft.geo.Geo
import graft.sources.GeoParquet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GeoParquet: `geo` footer round-trip, covering-bbox pushdown into
  * the parquet scan, WKT/WKB decode, fallback column sniffing, and
  * hive-partition discovery (reference GeoParquetMetadata.java:194,
  * ParquetInputFile.java:86-100). */
class GeoParquetSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_gpq").toString

  private def pointsDf(n: Int) = {
    import spark.implicits._
    spark.range(n).map { i =>
      val lon = (i * 37 % 360) - 180.0
      val lat = (i * 23 % 170) - 85.0
      (i, lon, lat, Geo.toWkb(Geo.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(lon, lat))))
    }.toDF("id", "lon", "lat", "geometry")
  }

  test("write + metadata: geo footer parses with covering and types") {
    val dir = tmp()
    GeoParquet.write(pointsDf(100), dir, geometryTypes = Seq("Point"))
    val meta = GeoParquet.metadata(spark, dir)
    assert(meta.version == "1.1.0")
    assert(meta.primaryColumn == "geometry")
    assert(meta.primary.encoding == "WKB")
    assert(meta.primary.geometryTypes == Seq("Point"))
    val cov = meta.primary.covering.get
    assert(cov.xmin == Seq("bbox", "xmin") && cov.ymax == Seq("bbox", "ymax"))
  }

  test("rewrite cleans stale part files; mis-shaped bbox rejected") {
    val dir = tmp()
    // wide write (many partitions), then a narrow rewrite: old parts
    // must not survive and mix into the next read
    GeoParquet.write(pointsDf(500).repartition(8), dir)
    GeoParquet.write(pointsDf(100).repartition(2), dir)
    assert(GeoParquet.read(spark, dir).count() == 100)
    // a pre-existing bbox column that is not the covering struct shape
    // must fail the write loudly (it would break bounds pruning)
    val bad = pointsDf(5).withColumn("bbox", col("id").cast("string"))
    val e = intercept[IllegalArgumentException] { GeoParquet.write(bad, tmp()) }
    assert(e.getMessage.contains("bbox"))
  }

  test("round-trip: geometries and attrs survive; bbox struct written") {
    val dir = tmp()
    GeoParquet.write(pointsDf(100), dir)
    val back = GeoParquet.read(spark, dir)
    assert(back.count() == 100)
    val r = back.where(col("id") === 10).collect().head
    val g = Geo.fromWkb(r.getAs[Array[Byte]]("geometry"))
    assert(g.getCoordinate.x == r.getAs[Double]("lon"))
    val bbox = r.getAs[org.apache.spark.sql.Row]("bbox")
    assert(bbox.getAs[Double]("xmin") == g.getCoordinate.x)
  }

  test("bounds read: covering predicates reach the scan as PushedFilters; exact result") {
    val dir = tmp()
    GeoParquet.write(pointsDf(1000), dir)
    val b = GeoParquet.Bounds(-30.0, -20.0, 40.0, 35.0)
    val q = GeoParquet.read(spark, dir, Some(b))
    val plan = q.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("bbox.xmax") && pushed.contains("bbox.ymin"),
      s"bbox range conjuncts not pushed: $pushed")
    val got = q.select(col("id")).collect().map(_.getLong(0)).toSet
    val want = (0L until 1000L).filter { i =>
      val lon = (i * 37 % 360) - 180.0
      val lat = (i * 23 % 170) - 85.0
      lon >= -30.0 && lon <= 40.0 && lat >= -20.0 && lat <= 35.0
    }.toSet
    assert(got == want)
  }

  test("fallback sniff: plain parquet with wkb_geometry / wkt_geometry columns") {
    import spark.implicits._
    val wkbDir = tmp()
    spark.range(5).map(i => (i, Geo.toWkb(Geo.factory.createPoint(
      new org.locationtech.jts.geom.Coordinate(i.toDouble, 1.0)))))
      .toDF("id", "wkb_geometry").write.mode("overwrite").parquet(wkbDir)
    val m1 = GeoParquet.metadata(spark, wkbDir)
    assert(m1.primaryColumn == "wkb_geometry" && m1.primary.encoding == "WKB")
    val back1 = GeoParquet.read(spark, wkbDir)
    assert(back1.columns.contains("geometry") && !back1.columns.contains("wkb_geometry"))
    assert(Geo.fromWkb(back1.where(col("id") === 3).collect().head
      .getAs[Array[Byte]]("geometry")).getCoordinate.x == 3.0)

    val wktDir = tmp()
    spark.range(5).map(i => (i, s"POINT ($i 2)".getBytes("UTF-8")))
      .toDF("id", "wkt_geometry").write.mode("overwrite").parquet(wktDir)
    val m2 = GeoParquet.metadata(spark, wktDir)
    assert(m2.primary.encoding == "WKT")
    // an un-annotated BINARY wkt column decodes as UTF-8, not toString
    val backB = GeoParquet.read(spark, wktDir)
    assert(Geo.fromWkb(backB.where(col("id") === 1).collect().head
      .getAs[Array[Byte]]("geometry")).getCoordinate.x == 1.0)
    val wktDir2 = tmp()
    spark.range(5).map(i => (i, s"POINT ($i 2)")).toDF("id", "wkt_geometry")
      .write.mode("overwrite").parquet(wktDir2)
    val back2 = GeoParquet.read(spark, wktDir2)
    assert(Geo.fromWkb(back2.where(col("id") === 4).collect().head
      .getAs[Array[Byte]]("geometry")).getCoordinate.y == 2.0)
  }

  test("hive partitions surface as columns through native discovery") {
    val dir = tmp()
    import spark.implicits._
    GeoParquet.write(pointsDf(10), s"$dir/region=west")
    GeoParquet.write(pointsDf(10), s"$dir/region=east")
    val back = GeoParquet.read(spark, dir)
    assert(back.columns.contains("region"))
    assert(back.groupBy("region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("west" -> 10L, "east" -> 10L))
  }

  test("geoarrow point encoding: struct x/y round-trip, bounds prune on coordinate stats") {
    import spark.implicits._
    val dir = tmp()
    val pts = spark.range(500).map { i =>
      val lon = (i * 37 % 360) - 180.0
      val lat = (i * 23 % 170) - 85.0
      (i, lon, lat)
    }.toDF("id", "x", "y")
      .select(col("id"), struct(col("x"), col("y")).as("geometry"))
    GeoParquet.write(pts, dir, geometryTypes = Seq("Point"), encoding = "point")
    val meta = GeoParquet.metadata(spark, dir)
    assert(meta.primary.encoding == "point" && meta.primary.covering.isEmpty)
    // bounds read: the x/y range predicates hit the parquet scan —
    // geoarrow's native-column pruning, no bbox companion needed
    val q = GeoParquet.read(spark, dir, Some(GeoParquet.Bounds(-30, -20, 40, 35)))
    val pushed = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("geometry.x") && pushed.contains("geometry.y"),
      s"geoarrow coord predicates not pushed: $pushed")
    val got = q.select(col("id")).collect().map(_.getLong(0)).toSet
    val want = (0L until 500L).filter { i =>
      val lon = (i * 37 % 360) - 180.0
      val lat = (i * 23 % 170) - 85.0
      lon >= -30 && lon <= 40 && lat >= -20 && lat <= 35
    }.toSet
    assert(got == want)
    // decoded geometry is real WKB
    val g = Geo.fromWkb(q.where(col("id") === got.head).collect().head
      .getAs[Array[Byte]]("geometry"))
    assert(g.getGeometryType == "Point")
  }

  test("geoarrow decode: all nested encodings to WKB") {
    import spark.implicits._
    // linestring: array<struct>, polygon: array<array<struct>>,
    // multipolygon: array^3 — written as plain Spark nested parquet,
    // read with explicit metadata (footer-less producer)
    val dir = tmp()
    Seq((1L, Seq((0.0, 0.0), (1.0, 1.0), (2.0, 0.0))))
      .toDF("id", "geom")
      .select(col("id"), transform(col("geom"),
        t => struct(t.getField("_1").as("x"), t.getField("_2").as("y"))).as("geom"))
      .write.mode("overwrite").parquet(dir)
    val meta = GeoParquet.Meta("1.1.0", "geom",
      Map("geom" -> GeoParquet.ColumnMeta("geoarrow.linestring", Seq("LineString"), None, None, None)))
    val back = GeoParquet.readWithMeta(spark, dir, meta, None)
    val line = Geo.fromWkb(back.collect().head.getAs[Array[Byte]]("geometry"))
    assert(line.getGeometryType == "LineString" && line.getNumPoints == 3)
    assert(line.getCoordinates()(2).x == 2.0)

    val dir2 = tmp()
    Seq((1L, Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)))))
      .toDF("id", "geom")
      .select(col("id"), transform(col("geom"), ring =>
        transform(ring, t => struct(t.getField("_1").as("x"), t.getField("_2").as("y")))).as("geom"))
      .write.mode("overwrite").parquet(dir2)
    val meta2 = GeoParquet.Meta("1.1.0", "geom",
      Map("geom" -> GeoParquet.ColumnMeta("geoarrow.polygon", Seq("Polygon"), None, None, None)))
    val poly = Geo.fromWkb(GeoParquet.readWithMeta(spark, dir2, meta2, None)
      .collect().head.getAs[Array[Byte]]("geometry"))
    assert(poly.getGeometryType == "Polygon" && poly.getArea == 8.0)
  }

  test("polygon bbox covers the full envelope (covering is conservative)") {
    import spark.implicits._
    val poly = Geo.fromWktOrNull("POLYGON ((10 10, 30 10, 30 25, 10 25, 10 10))")
    val dir = tmp()
    GeoParquet.write(Seq((1L, Geo.toWkb(poly))).toDF("id", "geometry"), dir,
      geometryTypes = Seq("Polygon"))
    // query box overlapping only a corner still finds it
    val hit = GeoParquet.read(spark, dir, Some(GeoParquet.Bounds(25, 20, 50, 50))).count()
    assert(hit == 1)
    // disjoint box does not
    val miss = GeoParquet.read(spark, dir, Some(GeoParquet.Bounds(40, 40, 50, 50))).count()
    assert(miss == 0)
  }

  test("WKT decode keeps the geometry column when the source column is named geometry") {
    import spark.implicits._
    val dir = tmp()
    Seq(("a", "POINT (1 2)"), ("b", "POINT (3 4)")).toDF("id", "geometry")
      .write.mode("overwrite").parquet(dir)
    val meta = GeoParquet.Meta("1.1.0", "geometry",
      Map("geometry" -> GeoParquet.ColumnMeta("WKT", Seq("Point"), None, None, None)))
    val df = GeoParquet.readWithMeta(spark, dir, meta, None)
    assert(df.columns.contains("geometry"))
    val pts = df.orderBy("id").collect()
      .map(r => Geo.fromWkb(r.getAs[Array[Byte]]("geometry")).getCoordinate)
    assert(pts.map(c => (c.x, c.y)).toSeq == Seq((1.0, 2.0), (3.0, 4.0)))
  }
}
