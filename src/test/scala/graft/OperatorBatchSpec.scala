package graft

import graft.engine._
import graft.geo.Simplify
import graft.text.Language
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-2 operator batch: i18n utilities, Chaikin
  * smoothing, point-buffer filter, descending sort keys, layer attr
  * stats, wikidata translations join. */
class OperatorBatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // non-ASCII fixtures via \u escapes (keeps the source file pure ASCII)
  private val Aland = "\u00c5land" // A-ring
  private val Oesterreich = "\u00d6sterreich" // O-umlaut
  private val Zuerich = "Z\u00fcrich" // u-umlaut
  private val Most = "\u043c\u043e\u0441\u0442" // cyrillic "most"
  private val Moskva = "\u041c\u043e\u0441\u043a\u0432\u0430" // cyrillic "Moskva"
  private val Tokyo = "\u6771\u4eac" // CJK "Tokyo"
  private val Berlin_ru = "\u0411\u0435\u0440\u043b\u0438\u043d" // cyrillic "Berlin"

  test("language: latin detection and latin/non-latin splitting") {
    assert(Language.containsOnlyLatinCharacters("Zurich 1. Teil"))
    assert(Language.containsOnlyLatinCharacters(s"$Aland $Oesterreich"))
    assert(!Language.containsOnlyLatinCharacters(s"$Most $Moskva"))
    assert(!Language.containsOnlyLatinCharacters(s"$Tokyo (Tokyo)"))
    assert(Language.removeLatinCharacters(s"$Tokyo (Tokyo)") == Tokyo)
    val nonLatinStripped = Language.removeNonLatinCharacters(s"$Tokyo (Tokyo)")
    assert(nonLatinStripped == "(Tokyo)" || nonLatinStripped == "Tokyo")
    // all-latin input leaves nothing -> null (reference isBlank -> null)
    assert(Language.removeLatinCharacters("only latin") == null)
    // no latin letters at all -> input passes through trimmed
    assert(Language.removeLatinCharacters(" 12 34 ") == "12 34")
  }

  test("language: osm name tag validation and latin-name fallback") {
    assert(Language.isValidOsmNameTag("name:en"))
    assert(Language.isValidOsmNameTag("name:zh-Hant"))
    assert(!Language.isValidOsmNameTag("name:left")) // 4-letter pseudo-lang
    assert(!Language.isValidOsmNameTag("name:UN")) // capitalized qualifier
    assert(!Language.isValidOsmNameTag("short_name"))
    assert(Language.latinName(Map("name" -> "Berlin")).contains("Berlin"))
    assert(Language.latinName(Map("name" -> Most, "name:en" -> "bridge")).contains("bridge"))
    assert(Language.latinName(Map("name" -> Most, "int_name" -> "most")).contains("most"))
    // latin-extended names are already latin (no transliteration needed)
    assert(Language.latinName(Map("name" -> Zuerich)).contains(Zuerich))
    assert(Language.transliterate(s"$Aland $Zuerich") == "Aland Zurich")
  }

  test("language: cyrillic/greek romanization tables") {
    val Moskva = "Москва" // Cyrillic capital M + oskva
    assert(Language.transliterate(Moskva) == "Moskva")
    val Shchyolkovo = "Щёлково"
    assert(Language.transliterate(Shchyolkovo) == "Shchelkovo") // NFD splits the io diaeresis
    val Kyiv = "Київ"
    assert(Language.transliterate(Kyiv) == "Kiyiv")
    val Athina = "Αθήνα" // Greek with accented eta
    assert(Language.transliterate(Athina) == "Athina")
    val Thessaloniki = "Θεσσαλονίκη"
    assert(Language.transliterate(Thessaloniki) == "Thessaloniki")
    // Han now romanizes via the vendored Unihan pinyin subset
    val Tokyo2 = "東京"
    assert(Language.transliterate(Tokyo2) == "dong jing")
    // latinName now resolves via romanization when no latin tag exists
    assert(Language.latinName(Map("name" -> Moskva)).contains("Moskva"))
  }

  test("chaikin smoothing: vertex squashing, keeps endpoints") {
    val line = Array(new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10))
    val out = Simplify.dualMidpointSmooth(line, 1)
    assert(out.head.equals2D(line.head) && out.last.equals2D(line.last))
    assert(out.length == 4) // start, b-point, a-point, end
    assert(out.exists(c => c.x == 7.5 && c.y == 0)) // 0.75 along first segment
    assert(out.exists(c => c.x == 10 && c.y == 2.5)) // 0.25 along second
    // tolerance stop: a straight line stops immediately
    val straight = Array(new Coordinate(0, 0), new Coordinate(5, 0), new Coordinate(10, 0))
    assert(Simplify.dualMidpointSmooth(straight, 10, minOffset = 0.5).length == 3)
    // rings stay closed
    val ring = Array(new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10),
      new Coordinate(0, 10), new Coordinate(0, 0))
    val rOut = Simplify.dualMidpointSmooth(ring, 2)
    assert(rOut.head.equals2D(rOut.last))
    assert(rOut.length > ring.length)
  }

  test("point-buffer filter drops far-outside points, keeps inner ones") {
    val inside = Mvt.LayerFeature(1, 1, Mvt.encodePoints(Array((100, 100))), Array.empty)
    val nearEdge = Mvt.LayerFeature(2, 1, Mvt.encodePoints(Array((-30, 200))), Array.empty) // ~2px out
    val farOut = Mvt.LayerFeature(3, 1, Mvt.encodePoints(Array((-500, 200))), Array.empty) // >16px out
    val multi = Mvt.LayerFeature(4, 1, Mvt.encodePoints(Array((50, 50), (-500, -500))), Array.empty)
    val line = Mvt.LayerFeature(5, 2, Mvt.encodeLines(Seq(Array((-500, 0), (5000, 0)))), Array.empty)
    val out = FeatureMerge.removePointsOutsideBuffer(
      Seq(inside, nearEdge, farOut, multi, line), maxBufferPx = 4)
    val ids = out.map(_.id)
    assert(ids.contains(1L) && ids.contains(2L) && !ids.contains(3L))
    assert(ids.contains(5L), "non-points untouched")
    val m = out.find(_.id == 4L).get
    assert(Mvt.decodeCommands(1, m.commands).flatMap(_._2) == Seq((50, 50)))
  }

  test("descending sort keys invert in-layer order and stay bijective") {
    val keys = Seq(-5, -1, 0, 1, 42, 1000)
    val metaAsc = keys.map(k => KvCodec.packMeta(1, k, 0L))
    val metaDesc = keys.map(k => KvCodec.packMeta(1, KvCodec.descendingSortKey(k), 0L))
    assert(metaAsc == metaAsc.sorted)
    assert(metaDesc == metaDesc.sorted.reverse)
    keys.foreach { k =>
      val m = KvCodec.packMeta(1, KvCodec.descendingSortKey(k), 0L)
      assert(KvCodec.descendingSortKey(KvCodec.sortKey(m)) == k)
    }
  }

  test("layer attr stats: types inferred, conflicts collapse to String") {
    import graft.model.FeatureSpec
    val specs = Seq(
      FeatureSpec("roads", Array.empty, 1, 0, 4, 9, Map("oneway" -> "true", "lanes" -> "2")),
      FeatureSpec("roads", Array.empty, 2, 0, 6, 12, Map("lanes" -> "wide", "name" -> "A1")),
      FeatureSpec("water", Array.empty, 3, 0, 0, 5, Map("depth" -> "1.5"))).toDS()
    val stats = TileStats.layerAttrStats(specs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getInt(3), r.getInt(4))).toMap
    assert(stats(("roads", "oneway")) == (("Boolean", 4, 9)))
    assert(stats(("roads", "lanes")) == (("String", 4, 12))) // Number vs String conflict
    assert(stats(("roads", "name")) == (("String", 6, 12)))
    assert(stats(("water", "depth")) == (("Number", 0, 5)))
    val json = TileStats.vectorLayersJson(TileStats.layerAttrStats(specs))
    assert(json.contains(""""id":"roads""""))
    assert(json.contains(""""oneway":"Boolean""""))
    assert(json.contains(""""minzoom":4"""))
  }

  test("layer attr stats: NULL attrs/zoomAttrs behave like empty — layer keeps its zoom range") {
    import graft.model.FeatureSpec
    val specs = Seq(
      FeatureSpec("ghost", Array.empty, 1, 0, 3, 8, attrs = null, zoomAttrs = null),
      FeatureSpec("roads", Array.empty, 2, 0, 4, 9, Map("oneway" -> "true"))).toDS()
    val rows = TileStats.layerAttrStats(specs).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getInt(3), r.getInt(4)))
    // the NULL-map spec must NOT vanish under three-valued NULL logic:
    // it contributes the attrless null-key row carrying its zoom range
    assert(rows.contains(("ghost", None, 3, 8)),
      s"NULL-attrs layer dropped; got ${rows.mkString(", ")}")
    assert(rows.exists { case (l, k, _, _) => l == "roads" && k.contains("oneway") })
  }

  test("layer attr stats: plan stays codegen-friendly (no countDistinct Expand, no interpreted HOF entry-builder)") {
    import graft.model.FeatureSpec
    val specs = Seq(
      FeatureSpec("roads", Array.empty, 1, 0, 4, 9, Map("oneway" -> "true")),
      FeatureSpec("pois", Array.empty, 2, 0, 4, 10, Map("name" -> "x"),
        zoomAttrs = Seq((6, Map("class" -> "cafe"))))).toDS()
    val plan = TileStats.layerAttrStats(specs).queryExecution.executedPlan.toString
    // countDistinct alongside other aggs plans an Expand + double
    // aggregate; the min!=max rewrite must keep it out (q59 4.55->1.87s)
    assert(!plan.contains("Expand"))
    // the statics path must be a plain generator explode, not the old
    // interpreted transform/filter/concat array builder
    assert(!plan.toLowerCase.contains("lambdafunction") ||
      plan.toLowerCase.linesIterator.count(_.contains("lambdafunction")) <= 1,
      "only the rare-zoomAttrs exists() lambda may remain")
  }

  test("layer attr stats: zoomAttrs surface from their threshold; attr-less layers keep their zoom range") {
    import graft.model.FeatureSpec
    val specs = Seq(
      // static name from z4; cafe-class attr only appears z6+ via zoomAttrs
      FeatureSpec("pois", Array.empty, 1, 0, 4, 10, Map("name" -> "x"),
        zoomAttrs = Seq((6, Map("class" -> "cafe")), (99, Map("never" -> "y")))),
      // a layer with no attributes at all must still reach vector_layers
      FeatureSpec("hillshade", Array.empty, 2, 0, 3, 8, Map.empty)).toDS()
    val stats = TileStats.layerAttrStats(specs).collect()
      .map(r => (r.getString(0), Option(r.getString(1))) ->
        (Option(r.getString(2)), r.getInt(3), r.getInt(4))).toMap
    assert(stats(("pois", Some("name"))) == ((Some("String"), 4, 10)))
    assert(stats(("pois", Some("class"))) == ((Some("String"), 6, 10))) // first visible at threshold
    assert(!stats.contains(("pois", Some("never")))) // threshold beyond maxzoom -> never visible
    assert(stats(("hillshade", None)) == ((None, 3, 8)))
    val json = TileStats.vectorLayersJson(TileStats.layerAttrStats(specs))
    assert(json.contains(""""id":"hillshade","minzoom":3,"maxzoom":8,"fields":{}"""))
    assert(json.contains(""""class":"String""""))
  }

  test("metadata json on an empty tileset emits integer zoom bounds") {
    import graft.model.TileBytes
    val empty = spark.emptyDataset[TileBytes]
    val json = TileStats.metadataJson(empty, "t", Seq("a"))
    assert(json.contains(""""minzoom":0,"maxzoom":0,"tiles":0"""))
    assert(!json.contains("null"))
  }

  test("extra-precision scale bits: kv roundtrip, unscale, e2e bounds") {
    import graft.model.Rendered
    // codec roundtrips the scale field
    val r = Rendered(42L, "lines", 3, 7L, 2, Mvt.encodeLines(Seq(Array((0, 0), (160, 80)))),
      Array.empty, 0L, 0, scale = 9)
    val back = KvCodec.decode(KvCodec.encode(r, 1), IndexedSeq("admin", "lines"))
    assert(back.scale == 9)
    // unscale divides, collapses duplicates, drops degenerates
    val scaled = Mvt.encodeLines(Seq(Array((0, 0), (1024, 0), (1030, 2)), Array((5, 5), (7, 6))))
    val un = Mvt.unscale(2, scaled, 9)
    val parts = Mvt.decodeCommands(2, un)
    assert(parts.length == 1, "sub-quantum line drops, collapsed point dedupes")
    assert(parts.head._2.toSeq == Seq((0, 0), (2, 0)))
    // e2e: a line pipeline at low zoom emits tile-extent coordinates
    // (scale applied during render, unscaled at write)
    val docs = {
      import spark.implicits._
      Seq(("line_1", Seq(
        graft.model.Span("geom", "LINESTRING (-100 20, 100 25)", null, 0)))).toDF("doc_id", "spans")
    }
    val tiles = Pipeline.tiles(docs, new Pipeline.GraftProfile(5, 5, 5), 2, gzipTiles = false).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { t =>
      Mvt.decodeTile(t.bytes).foreach { f =>
        // decoded coords sit in plain extent space (plus buffer), not 2^scale space
        val cs = f.parts.flatMap(_._2)
        assert(cs.forall { case (x, y) =>
          x >= -600 && x <= Mvt.Extent + 600 && y >= -600 && y <= Mvt.Extent + 600
        }, s"unscaled coords out of range: ${cs.take(3)}")
      }
    }
  }

  test("GraftExtensions: functions + pushdown rule via withExtensions") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // sibling session on the SAME context, with the extensions applied
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      // injected scalar functions resolve in plain SQL
      val r = s2.sql("SELECT world_x(0.0) AS wx, tile_id(0.0, 0.0, 2) AS tid, " +
        "cel_eval('${ 2 + 3 }', map('a','b'), 1L, 'src') AS cel").collect()(0)
      assert(r.getDouble(0) == 0.5)
      assert(r.getLong(1) == graft.geo.TileCoord.hilbertIdOf(0, 0, 2))
      assert(r.getString(2) == "5")
      // injected optimizer rule expands st_contains into ranges that
      // reach the parquet scan as PushedFilters
      import graft.functions.SpatialRules
      val poly = graft.geo.Geo.fromWktOrNull("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
      import s2.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString + "/pts"
      Seq((1.0, 1.0), (50.0, 50.0)).toDF("lon", "lat").write.parquet(dir)
      val df = s2.read.parquet(dir)
        .where(SpatialRules.st_contains_lonlat(
          org.apache.spark.sql.functions.lit(graft.geo.Geo.toWkb(poly)),
          org.apache.spark.sql.functions.col("lon"),
          org.apache.spark.sql.functions.col("lat")))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        (plan.contains("GreaterThanOrEqual(lon") || plan.contains("LessThanOrEqual(lon")),
        s"bbox conjuncts not pushed:\n${plan.take(1500)}")
      assert(df.count() == 1)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      prev.foreach { p =>
        org.apache.spark.sql.SparkSession.setActiveSession(p)
        org.apache.spark.sql.SparkSession.setDefaultSession(p)
      }
    }
  }

  test("wikidata translations broadcast-join fills missing name tags") {
    import graft.model.SourceFeature
    val feats = Seq(
      SourceFeature("a", "osm", Array[Byte](1), Map("wikidata" -> "Q64", "name" -> "Berlin"), 1L),
      SourceFeature("b", "osm", Array[Byte](1), Map("wikidata" -> "Q64", "name:de" -> "keep"), 2L),
      SourceFeature("c", "osm", Array[Byte](1), Map("name" -> "nowhere"), 3L)).toDS()
    val wd = Seq(("Q64", Map("de" -> "Berlin", "ru" -> Berlin_ru))).toDF("qid", "names")
    val out = Wikidata.attachTranslations(feats, wd).collect().map(f => f.doc_id -> f.tags).toMap
    assert(out("a")("name:de") == "Berlin")
    assert(out("a")("name:ru") == Berlin_ru)
    assert(out("b")("name:de") == "keep", "existing tags win")
    assert(out("b")("name:ru") == Berlin_ru)
    assert(out("c") == Map("name" -> "nowhere"))
  }
}
