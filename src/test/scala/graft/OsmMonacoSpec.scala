package graft

import graft.engine.Osm
import org.scalatest.funsuite.AnyFunSuite

/**
 * Real-world end-to-end: the monaco extract (the reference's own
 * benchmark fixture, `PlanetilerTests`/`OsmInputFileTest`) through
 * pbf scan → way materialization → multipolygon assembly → render →
 * tile assembly. Asserts structural invariants that pin the whole
 * distributed pipeline, not just the codec.
 */
class OsmMonacoSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val monacoPath =
    "/root/reference/planetiler-core/src/test/resources/monaco-latest.osm.pbf"
  private def available = new java.io.File(monacoPath).canRead

  test("monaco: sourceFeatures materializes points, lines, and polygons") {
    assume(available)
    val fs = Osm.sourceFeatures(spark.read.format("osmpbf").load(monacoPath))
    val byKind = fs.collect().groupBy(f => f.doc_id.takeWhile(_ != '/'))
    // every tagged node emits; monaco carries thousands of POIs
    assert(byKind("node").length > 2000, s"points=${byKind("node").length}")
    assert(byKind("way").length > 2000, s"ways=${byKind("way").length}")
    assert(byKind("relation").nonEmpty)
    // all geometries inside the header bbox (7.40..7.45, 43.72..43.76)
    // with a slack margin for ways touching the clip edge
    val env = new org.locationtech.jts.geom.Envelope(7.35, 7.50, 43.70, 43.78)
    val outside = byKind.values.flatten.filterNot { f =>
      env.contains(graft.geo.Geo.fromWkb(f.geom).getEnvelopeInternal)
    }
    assert(outside.size < byKind.values.map(_.length).sum / 100,
      s"${outside.size} features outside monaco bbox")
  }

  test("monaco: boundary relations assemble and route info reaches member ways") {
    assume(available)
    val fs = Osm.sourceFeatures(spark.read.format("osmpbf").load(monacoPath)).collect()
    // monaco carries admin boundary relations (country + quartiers):
    // type=boundary must ring-assemble into polygonal relation features
    val boundaries = fs.filter(f => f.doc_id.startsWith("relation/") &&
      f.tags.get("boundary").contains("administrative"))
    assert(boundaries.length >= 5, s"admin boundaries=${boundaries.length}")
    assert(boundaries.forall { f =>
      val g = graft.geo.Geo.fromWkb(f.geom)
      g.isInstanceOf[org.locationtech.jts.geom.Polygon] ||
        g.isInstanceOf[org.locationtech.jts.geom.MultiPolygon]
    })
    // monaco's bus routes: member ways must carry route-relation info
    val withRoutes = fs.filter(f => f.doc_id.startsWith("way/") &&
      f.relations.exists(_.rel_tags.get("type").contains("route")))
    assert(withRoutes.length > 50, s"ways with route info=${withRoutes.length}")
    assert(withRoutes.exists(_.relations.exists(_.rel_tags.contains("ref"))))
  }

  test("monaco: full tile pyramid renders deterministically") {
    assume(available)
    val tiles = Osm.tiles(spark, monacoPath, numPartitions = 8).collect()
    assert(tiles.count(_.z == 0) == 1)
    // monaco spans very few tiles below z8; every zoom present
    (0 to 7).foreach { z =>
      assert(tiles.exists(_.z == z), s"no tiles at z$z")
    }
    assert(tiles.forall(_.bytes.nonEmpty))
    // second run must be byte-identical (deterministic pipeline)
    val again = Osm.tiles(spark, monacoPath, numPartitions = 8).collect()
    val a = tiles.map(t => (t.tile_id, t.bytes.toSeq)).sortBy(_._1).toSeq
    val b = again.map(t => (t.tile_id, t.bytes.toSeq)).sortBy(_._1).toSeq
    assert(a == b, "tile bytes differ between identical runs")
  }
}
