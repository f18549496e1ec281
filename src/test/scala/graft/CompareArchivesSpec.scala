package graft

import graft.engine.{CompareArchives, MbtilesArchive, Mvt}
import graft.model.TileBytes
import org.scalatest.funsuite.AnyFunSuite

/** Archive diff + verification (reference util/CompareArchives.java,
  * mbtiles/Verify.java) as a distributed tile-address join. */
class CompareArchivesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def mvt(layers: (String, Int)*): Array[Byte] =
    Mvt.encodeTile(layers.map { case (name, n) =>
      (name, (0 until n).map(i =>
        Mvt.LayerFeature(i.toLong, 1, Array(9, 2 * i, 2 * i), Array.emptyByteArray, 0)))
    })

  private def df(rows: (Int, Int, Int, Array[Byte])*) = {
    import spark.implicits._
    rows.toSeq.toDF("z", "x", "y", "bytes")
  }

  test("identical archives compare clean") {
    val a = df((0, 0, 0, mvt("pts" -> 2)), (1, 0, 1, mvt("pts" -> 1, "lines" -> 3)))
    val r = CompareArchives.compare(a, a)
    assert(r.ok && r.matching == 2 && r.total1 == 2 && r.total2 == 2)
    assert(r.report.contains("identical"))
  }

  test("missing tiles, missing layers, feature diffs all categorized") {
    val t00 = mvt("pts" -> 2)
    val a = df(
      (0, 0, 0, t00),
      (1, 0, 1, mvt("pts" -> 1, "lines" -> 3)),
      (1, 1, 1, mvt("pts" -> 1)))               // missing from b
    val b = df(
      (0, 0, 0, t00),                           // identical
      (1, 0, 1, mvt("pts" -> 1)),               // lines layer gone
      (2, 0, 0, mvt("pts" -> 1)))               // extra in b
    val r = CompareArchives.compare(a, b)
    assert(!r.ok)
    assert(r.diffsByIssue("archive 2 missing tile") == 1)
    assert(r.diffsByIssue("archive 1 missing tile") == 1)
    assert(r.diffsByIssue("archive 2 missing layer lines") == 1)
    assert(r.matching == 1)
    assert(r.diffsByZoom(1) == 2 && r.diffsByZoom(2) == 1)
    assert(r.sampleDiffs.nonEmpty)
  }

  test("feature-level diffs: same layers, different contents") {
    val a = df((3, 1, 2, mvt("pts" -> 4)))
    val b = df((3, 1, 2, mvt("pts" -> 5)))
    val r = CompareArchives.compare(a, b)
    assert(r.diffsByIssue.keySet == Set("layer pts feature count 4 != 5"))
  }

  test("verifyMbtiles: structure checks + min feature counts") {
    import spark.implicits._
    val tiles = Seq(
      TileBytes(graft.geo.TileCoord.encodeHilbert(0, 0, 1), 1, 0, 0, mvt("pts" -> 3), 3, 1L),
      TileBytes(graft.geo.TileCoord.encodeHilbert(1, 1, 1), 1, 1, 1, mvt("pts" -> 2), 2, 2L))
      .sortBy(_.tile_id).toDS().coalesce(1).sortWithinPartitions("tile_id")
    val path = java.nio.file.Files.createTempDirectory("graft_cmp").toString + "/v.mbtiles"
    MbtilesArchive.write(tiles, path, Map("name" -> "t", "format" -> "pbf"))
    val ok = CompareArchives.verifyMbtiles(spark, path,
      minFeatureCounts = Seq(("pts", 1, 5)))
    assert(ok.ok, ok.report)
    val bad = CompareArchives.verifyMbtiles(spark, path,
      minFeatureCounts = Seq(("pts", 1, 6), ("roads", 1, 1)))
    assert(!bad.ok)
    assert(bad.report.contains("found 5") && bad.report.contains("found 0"))
  }
}
