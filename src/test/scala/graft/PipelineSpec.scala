package graft

import graft.engine._
import graft.geo.{Geo, Mercator, TileCoord}
import graft.model._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end pipeline tests in the shape of the reference's
 * PlanetilerTests ("in-memory tests with fake data and profiles to
 * ensure all features work end-to-end"): synthetic docs -> full
 * pipeline -> decoded tile map -> assert tile contents.
 */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def docsOf(rows: (String, Seq[Span])*) = {
    import spark.implicits._
    rows.map { case (id, spans) => Doc(id, spans) }.toDF("doc_id", "spans")
  }

  private def geomSpan(wkt: String, off: Int) = Span("geom", wkt, null, off)
  private def textSpan(t: String, off: Int) = Span("text", t, null, off)
  private def mediaSpan(r: String, off: Int) = Span("media", null, r, off)

  test("single point renders into the right tile at every zoom") {
    // lon 1, lat 1 -> worldX just over 0.5
    val docs = docsOf("doc_1" -> Seq(textSpan("hello", 0), geomSpan("POINT (1 1)", 1)))
    val profile = new Pipeline.GraftProfile(pointMaxZoom = 4)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    // the PRIMARY tile (containing the point) exists at every zoom;
    // extra tiles are buffered copies near edges (by design — labels
    // must render across tile boundaries, like the reference)
    for (z <- 0 to 4) {
      val expX = Mercator.tileIndex(Mercator.worldX(1), z)
      val expY = Mercator.tileIndex(Mercator.worldY(1), z)
      val zt = tiles.filter(_.z == z)
      assert(zt.exists(t => t.x == expX && t.y == expY), s"zoom $z")
    }
    for (t <- tiles) {
      val dec = Mvt.decodeTile(t.bytes)
      assert(dec.size == 1)
      assert(dec.head.layer == "points")
      assert(dec.head.attrs("text") == "hello")
    }
  }

  test("polygon renders fills and edges; tile count matches pyramid") {
    val docs = docsOf("adm_0" -> Seq(
      textSpan("admin box", 0),
      geomSpan("POLYGON ((-180 -85, 180 -85, 180 85, -180 85, -180 -85))", 1)))
    val profile = new Pipeline.GraftProfile(polyMaxZoom = 4)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    // world-covering polygon: every tile in the z0..4 pyramid
    assert(tiles.length == TileCoord.pyramidSize(4))
    // every tile decodes to a polygon feature in layer "admin"
    val sample = tiles.find(t => t.z == 3).get
    val dec = Mvt.decodeTile(sample.bytes)
    assert(dec.head.layer == "admin" && dec.head.geomType == 3)
    // interior tiles share identical content (dedup-ready): at z4 there
    // must be many identical content hashes (canonical fills)
    val z4 = tiles.filter(_.z == 4)
    val hashGroups = z4.groupBy(_.content_hash)
    assert(hashGroups.values.exists(_.length > 10), "expected shared fill content")
  }

  test("line spanning tiles appears in each, clipped") {
    val docs = docsOf("line_1" -> Seq(
      textSpan("road", 0),
      geomSpan("LINESTRING (-100 20, 100 25)", 1),
      mediaSpan("media://x/1", 2)))
    val profile = new Pipeline.GraftProfile(lineMaxZoom = 5)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    val z5 = tiles.filter(_.z == 5)
    assert(z5.length >= 16, s"long line should span many z5 tiles, got ${z5.length}")
    assert(z5.forall(t => Mvt.decodeTile(t.bytes).head.geomType == 2))
  }

  test("label grid limit keeps top-K per cell") {
    // 30 points at nearly the same location, limit 16 per 64px cell
    val docs = docsOf((1 to 30).map { i =>
      s"doc_$i" -> Seq(geomSpan(s"POINT (${10 + i * 0.0001} 10)", 0))
    }: _*)
    val profile = new Pipeline.GraftProfile(pointMaxZoom = 2)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    val z2 = tiles.filter(_.z == 2)
    assert(z2.length == 1)
    val dec = Mvt.decodeTile(z2.head.bytes)
    assert(dec.size == 16, s"label grid limit 16, got ${dec.size}")
  }

  test("span_sig survives the full pipeline (order-sensitive invariant)") {
    import spark.implicits._
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val before = docs.withColumn("sig", Docs.spanSigCol)
      .select("doc_id", "sig").as[(String, Long)].collect().toMap
    // after a full shuffle (repartition + sort), sigs must be unchanged
    val after = docs.repartition(7, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("sig", Docs.spanSigCol)
      .select("doc_id", "sig").as[(String, Long)].collect().toMap
    assert(before == after)
    // and the extracted SourceFeatures carry the same sig
    val sf = Docs.sourceFeatures(Docs.pointDocs(spark, "/root/testdata/sf0.001"))
    val sfSigs = sf.map(f => (f.doc_id, f.span_sig)).collect().toMap
    assert(sfSigs.forall { case (id, sig) => before(id) == sig })
  }

  test("tiles are globally hilbert-ordered across partitions") {
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val profile = new Pipeline.GraftProfile(3, 3, 3)
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 4, gzipTiles = false)
    val ids = tiles.select("tile_id").collect().map(_.getLong(0))
    // collect() preserves partition order; within the range-partitioned
    // + sorted dataset that means global order
    assert(ids.toSeq == ids.sorted.toSeq)
    assert(ids.distinct.length == ids.length, "one output row per tile")
  }

  test("postProcessTile moves features across layers before the per-layer pass") {
    val docs = docsOf(
      "doc_1" -> Seq(textSpan("a", 0), geomSpan("POINT (1 1)", 1)),
      "adm_1" -> Seq(textSpan("b", 0), geomSpan("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", 1)))
    val profile = new Pipeline.GraftProfile(2, 2, 2) {
      // move every point feature into the admin layer, tile-wide
      override def postProcessTile(zoom: Int, x: Int, y: Int,
          tl: Map[String, Seq[Mvt.LayerFeature]]): Map[String, Seq[Mvt.LayerFeature]] = {
        val pts = tl.getOrElse("points", Nil)
        val adm = tl.getOrElse("admin", Nil)
        (tl - "points") + ("admin" -> (adm ++ pts))
      }
      // per-layer hook runs AFTER the tile hook: drop any point that is
      // still in the points layer — if ordering were wrong, the moved
      // point would be deleted and the geomType==1 assert below fails
      override def postProcessLayer(layer: String, zoom: Int,
          features: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] =
        if (layer == "points") Seq.empty else features
    }
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    val decoded = tiles.flatMap(t => Mvt.decodeTile(t.bytes))
    assert(decoded.nonEmpty)
    assert(decoded.forall(_.layer == "admin"), "points layer should be gone")
    assert(decoded.exists(_.geomType == 1), "moved point feature must survive")
  }

  test("Profile.finish emits end-of-source features into the stream") {
    val docs = docsOf("doc_1" -> Seq(textSpan("a", 0), geomSpan("POINT (1 1)", 1)))
    val profile = new Pipeline.GraftProfile(2, 2, 2) {
      override def sources: Seq[String] = Seq("doc")
      override def finish(source: String): Iterator[FeatureSpec] = {
        // one synthetic marker point per finished source at lon/lat 0
        val world = Render.worldWkb(Geo.fromWktOrNull("POINT (0 0)"))
        Iterator.single(FeatureSpec(
          layer = "points", geom = world, id = 999L, sortKey = 0,
          minzoom = 0, maxzoom = 0, attrs = Map("text" -> s"finish:$source")))
      }
    }
    val tiles = Pipeline.tiles(docs, profile, numPartitions = 2, gzipTiles = false).collect()
    val z0 = tiles.filter(_.z == 0).flatMap(t => Mvt.decodeTile(t.bytes))
    assert(z0.exists(_.attrs.get("text").contains("finish:doc")),
      s"finish feature missing; z0 attrs = ${z0.map(_.attrs).toSeq}")
  }

  test("e2e line merge: connected same-attr segments fuse into one feature") {
    // three chained segments from separate docs, same text attr ->
    // same packed attrs -> the lines-layer post-process merges them
    // (the PlanetilerTests.testMergeLineStrings analog, through the
    // full pipeline incl. the extra-precision scale path)
    val docs = docsOf(
      "line_1" -> Seq(textSpan("road", 0), geomSpan("LINESTRING (0 0, 1 1)", 1)),
      "line_2" -> Seq(textSpan("road", 0), geomSpan("LINESTRING (1 1, 2 0)", 1)),
      "line_3" -> Seq(textSpan("road", 0), geomSpan("LINESTRING (2 0, 3 1)", 1)))
    val profile = new Pipeline.GraftProfile(5, 5, 5) {
      override def postProcessLayer(layer: String, zoom: Int,
          features: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] =
        if (layer == "lines") FeatureMerge.mergeLineStrings(features) else features
    }
    val tiles = Pipeline.tiles(docs, profile, 2, gzipTiles = false).collect()
    val z4 = tiles.filter(t => t.z == 4) // lines render z4..5
    assert(z4.nonEmpty)
    // the tile containing all three merges them into a single feature
    val counts = z4.map(t => Mvt.decodeTile(t.bytes).count(_.geomType == 2))
    assert(counts.exists(_ == 1), s"expected a merged single line, got $counts")
    // unmerged control: without the hook some tile keeps 3 features
    val plain = Pipeline.tiles(docs, new Pipeline.GraftProfile(5, 5, 5), 2, gzipTiles = false)
      .collect().filter(_.z == 4)
      .map(t => Mvt.decodeTile(t.bytes).count(_.geomType == 2))
    assert(plain.exists(_ == 3))
  }

  test("e2e loop breaking: short parallel arm drops at low zoom") {
    // a main road that arcs between two junctions, plus a straight
    // shortcut — the junctions stay degree-3 because the road continues
    // beyond them (the reference's testRemoveSmallLoops shape);
    // loopMinPx large enough to break the loop keeps the short path
    val docs = docsOf(
      "line_1" -> Seq(textSpan("r", 0),
        geomSpan("LINESTRING (5 10, 6 10, 7 10.8, 8 10, 9 10)", 1)),
      "line_2" -> Seq(textSpan("r", 0), geomSpan("LINESTRING (6 10, 8 10)", 1)))
    val profile = new Pipeline.GraftProfile(5, 5, 5) {
      override def postProcessLayer(layer: String, zoom: Int,
          features: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] =
        if (layer == "lines") FeatureMerge.mergeLineStrings(features, loopMinPx = 300)
        else features
    }
    val tiles = Pipeline.tiles(docs, profile, 2, gzipTiles = false).collect().filter(_.z == 4)
    val feats = tiles.flatMap(t => Mvt.decodeTile(t.bytes).filter(_.geomType == 2))
    assert(feats.nonEmpty)
    // the arched arm is gone: merged line runs straight along lat 10 —
    // no surviving vertex at lat 10.8 (tile-local y differs by >100)
    val parts = feats.flatMap(_.parts.map(_._2))
    val ys = parts.flatMap(_.map(_._2))
    assert(ys.nonEmpty && ys.max - ys.min < 50,
      s"arched arm should have been broken; y spread = ${ys.min}..${ys.max}")
    // and the shortcut path is a single merged stroke
    assert(parts.exists(_.length >= 4), s"expected merged through-line, got ${parts.map(_.length).toSeq}")
  }

  test("versioned snapshots: commit via version hint, resume, recompute bumps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vsnap").toString + "/table"
    val ds1 = Seq(1, 2, 3).toDS()
    val (r1, v1) = Pipeline.snapshotVersioned(ds1, dir)
    assert(v1 == 1 && r1.collect().sorted.toSeq == Seq(1, 2, 3))
    // resume: a DIFFERENT dataset short-circuits to the committed version
    val (r2, v2) = Pipeline.snapshotVersioned(Seq(9, 9).toDS(), dir)
    assert(v2 == 1 && r2.collect().sorted.toSeq == Seq(1, 2, 3))
    // recompute commits version 2; readers switch only after the rename
    val (r3, v3) = Pipeline.snapshotVersioned(Seq(7, 8).toDS(), dir, recompute = true)
    assert(v3 == 2 && r3.collect().sorted.toSeq == Seq(7, 8))
    val (r4, v4) = Pipeline.snapshotVersioned(Seq(0).toDS(), dir)
    assert(v4 == 2 && r4.collect().sorted.toSeq == Seq(7, 8))
    // older snapshot still present on disk (time travel by path)
    assert(spark.read.parquet(s"$dir/snapshot-1").count() == 3)
  }

  test("salted aggregation equals direct groupBy on skewed keys") {
    import spark.implicits._
    // one hot key carrying 90% of rows
    val df = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 7}", i.toLong))).toDF("k", "v")
    val salted = graft.engine.Salt.aggregate(df, Seq("k"),
      Seq(graft.engine.Salt.sumOf(col("v"), "s"), graft.engine.Salt.countAll("n"),
        graft.engine.Salt.minOf(col("v"), "lo"), graft.engine.Salt.maxOf(col("v"), "hi")),
      buckets = 8)
    val direct = df.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    assert(salted.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }

  test("checkpoint resume: snapshot read-back equals computed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString + "/stage1"
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val rendered = Pipeline.renderedFromDocs(docs, new Pipeline.GraftProfile(3, 3, 3))
    val first = Pipeline.checkpoint(rendered, dir)
    val n1 = first.count()
    // second call must hit the snapshot (no recompute): same rows
    val second = Pipeline.checkpoint(rendered.limit(0), dir) // would be wrong if recomputed
    assert(second.count() == n1)
  }
}
