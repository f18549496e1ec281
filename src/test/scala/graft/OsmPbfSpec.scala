package graft

import graft.sources.{OsmPbf, OsmPbfDataSource}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * From-scratch OSM PBF codec + DSv2 source. Round-trip fixtures are
 * synthesized deterministically; the real-world cross-check decodes
 * the reference repo's public monaco extract and asserts the same
 * entity counts / entity contents its own test suite does
 * (reference `reader/osm/OsmInputFileTest.java:23-165`).
 */
class OsmPbfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val conf = new Configuration()

  private val monacoPath =
    "/root/reference/planetiler-core/src/test/resources/monaco-latest.osm.pbf"
  private def monacoAvailable = new java.io.File(monacoPath).canRead

  // deterministic synthetic entities: 1000 nodes, 120 ways, 10 relations
  private def fixtureEntities: Seq[OsmPbf.Entity] = {
    val nodes = (0 until 1000).map { i =>
      OsmPbf.Entity("node", 1000L + i,
        math.rint(((i * 7919 % 17000) / 100.0 - 85.0) * 1e7) / 1e7,
        math.rint(((i * 9973 % 36000) / 100.0 - 180.0) * 1e7) / 1e7,
        if (i % 3 == 0) Seq("highway" -> "crossing", "ref" -> s"n$i") else Nil,
        Array.empty, Array.empty, Array.empty, Array.empty,
        version = 1 + i % 5, timestamp = 1600000000L + i, changeset = 77L + i % 9,
        uid = i % 13, user = if (i % 2 == 0) "alice" else "bob")
    }
    val ways = (0 until 120).map { i =>
      OsmPbf.Entity("way", 5000L + i, Double.NaN, Double.NaN,
        Seq("highway" -> (if (i % 2 == 0) "primary" else "residential"), "name" -> s"Way $i"),
        (0 until 4 + i % 7).map(j => 1000L + (i * 13 + j * 3) % 1000).toArray,
        Array.empty, Array.empty, Array.empty,
        version = 2, timestamp = 1600100000L + i, changeset = 88L, uid = 3, user = "carol")
    }
    val rels = (0 until 10).map { i =>
      OsmPbf.Entity("relation", 9000L + i, Double.NaN, Double.NaN,
        Seq("type" -> "multipolygon", "landuse" -> "park"),
        Array.empty,
        Array("way", "way", "node"),
        Array(5000L + i, 5000L + i + 1, 1000L + i),
        Array("outer", "inner", "label"),
        version = 3, timestamp = 1600200000L + i, changeset = 99L, uid = 4, user = "dave")
    }
    nodes ++ ways ++ rels
  }

  private lazy val fixturePath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pbf")
    val p = dir.resolve("fixture.osm.pbf").toString
    OsmPbf.write(p, conf, fixtureEntities.iterator,
      bbox = Some((-180.0, -85.0, 180.0, 85.0)), blockSize = 300)
    p
  }

  test("round-trip: write → readAll preserves every field") {
    val back = OsmPbf.readAll(fixturePath, conf).toSeq
    val orig = fixtureEntities
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.kind == o.kind && b.id == o.id)
      if (o.kind == "node") {
        assert(math.abs(b.lat - o.lat) < 1e-8 && math.abs(b.lon - o.lon) < 1e-8)
      }
      assert(b.tags == o.tags, s"${o.kind} ${o.id} tags")
      assert(b.refs.toSeq == o.refs.toSeq)
      assert(b.memberTypes.toSeq == o.memberTypes.toSeq)
      assert(b.memberIds.toSeq == o.memberIds.toSeq)
      assert(b.memberRoles.toSeq == o.memberRoles.toSeq)
      assert(b.version == o.version && b.timestamp == o.timestamp)
      assert(b.changeset == o.changeset && b.uid == o.uid && b.user == o.user)
    }
  }

  test("header: bbox and features round-trip") {
    val h = OsmPbf.readHeader(fixturePath, conf).get
    assert(h.left == -180.0 && h.right == 180.0 && h.bottom == -85.0 && h.top == 85.0)
    assert(h.requiredFeatures == Seq("OsmSchema-V0.6", "DenseNodes"))
    assert(h.writingProgram == "graft")
  }

  test("monaco: entity counts match the reference's own expectations") {
    assume(monacoAvailable)
    val counts = OsmPbf.readAll(monacoPath, conf)
      .foldLeft(Map.empty[String, Int].withDefaultValue(0)) { (m, e) => m.updated(e.kind, m(e.kind) + 1) }
    assert(counts("node") == 25423)
    assert(counts("way") == 4106)
    assert(counts("relation") == 243)
  }

  test("lz4 monaco decodes identically to the zlib monaco (from-scratch LZ4 block decode)") {
    val lz4Path =
      "/root/reference/planetiler-core/src/test/resources/monaco-latest.lz4.osm.pbf"
    assume(monacoAvailable && new java.io.File(lz4Path).canRead)
    // the reference ships the SAME extract lz4- and zlib-compressed;
    // both must decode to the same entity stream, bit for bit
    def sig(path: String): Seq[(String, Long, Double, Double, Int, Int, Long)] =
      OsmPbf.readAll(path, conf).map { e =>
        (e.kind, e.id, if (e.lat.isNaN) 0.0 else e.lat, if (e.lon.isNaN) 0.0 else e.lon,
          e.tags.hashCode, java.util.Arrays.hashCode(e.refs), e.timestamp)
      }.toSeq
    val a = sig(monacoPath)
    val b = sig(lz4Path)
    assert(b.size == a.size)
    assert(b == a)
  }

  test("lz4: corrupt blocks fail loudly with named reasons, never a bare index error") {
    // valid round trip first: a literal-only block (token 0x50 = 5 literals)
    val ok = OsmPbf.lz4DecompressBlock(Array(0x50, 'a', 'b', 'c', 'd', 'e').map(_.toByte), 5)
    assert(new String(ok, "UTF-8") == "abcde")
    def msg(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    // literal run overruns the input bytes
    assert(msg(OsmPbf.lz4DecompressBlock(Array(0x70, 'a').map(_.toByte), 7))
      .contains("literal run"))
    // literal run overruns raw_size
    assert(msg(OsmPbf.lz4DecompressBlock(Array(0x50, 'a', 'b', 'c', 'd', 'e').map(_.toByte), 3))
      .contains("overruns raw_size"))
    // truncated match offset (one byte where two are required)
    assert(msg(OsmPbf.lz4DecompressBlock(Array(0x12, 'a', 0x01).map(_.toByte), 30))
      .contains("truncated match offset"))
    // truncated literal-length extension (0xF0 token, no extension byte)
    assert(msg(OsmPbf.lz4DecompressBlock(Array(0xF0.toByte), 40))
      .contains("truncated literal-length extension"))
    // match overruns raw_size: 1 literal then a 4-byte match into size-2 output
    assert(msg(OsmPbf.lz4DecompressBlock(Array(0x10, 'a', 0x01, 0x00).map(_.toByte), 2))
      .contains("overruns raw_size"))
    // overlap RLE still exact: 1 literal 'x' + match offset 1 len 8 -> 9 x's
    val rle = OsmPbf.lz4DecompressBlock(Array(0x14, 'x', 0x01, 0x00).map(_.toByte), 9)
    assert(new String(rle, "UTF-8") == "xxxxxxxxx")
  }

  test("monaco: specific node/way/relation decode exactly") {
    assume(monacoAvailable)
    val all = OsmPbf.readAll(monacoPath, conf).toSeq
    val node = all.find(e => e.kind == "node" && e.id == 1737114566L).get
    assert(node.lat == 43.7409723 && node.lon == 7.4303278)
    assert(node.tags.toMap == Map("highway" -> "crossing", "crossing" -> "zebra"))
    assert(node.version == 5 && node.timestamp == 1600807207L && node.changeset == 0L)

    val way = all.find(e => e.kind == "way" && e.id == 4097656L).get
    assert(way.refs.toSeq == Seq(21912089L, 7265761724L, 1079750744L, 2104793864L,
      6340961560L, 1110560507L, 21912093L, 6340961559L, 21912095L, 7265762803L,
      2104793866L, 6340961561L, 5603088200L, 6340961562L, 21912097L, 21912099L))
    assert(way.tags.toMap == Map("name" -> "Avenue Princesse Alice", "lanes" -> "2",
      "maxspeed" -> "30", "highway" -> "primary", "surface" -> "asphalt", "lit" -> "yes"))
    assert(way.version == 13 && way.timestamp == 1583398246L)

    val rel = all.find(e => e.kind == "relation" && e.id == 7360630L).get
    assert(rel.memberTypes.toSeq == Seq("way", "way", "node", "node", "node", "node"))
    assert(rel.memberIds.toSeq == Seq(503638817L, 503638816L, 4939122054L,
      3465728159L, 4939122068L, 3805333988L))
    assert(rel.memberRoles.toSeq == Seq("platform", "platform", "platform", "stop", "platform", "stop"))
    assert(rel.tags.toMap.apply("operator") == "Compagnie des Autobus de Monaco")
  }

  test("monaco: header bounds + replication metadata") {
    assume(monacoAvailable)
    val h = OsmPbf.readHeader(monacoPath, conf).get
    assert(h.left == 7.409205 && h.right == 7.448637)
    assert(h.bottom == 43.72335 && h.top == 43.75169)
    assert(h.requiredFeatures == Seq("OsmSchema-V0.6", "DenseNodes"))
    assert(h.writingProgram == "osmium/1.8.0")
    assert(h.replicationSequence == 2947L)
    assert(h.replicationBaseUrl == "http://download.geofabrik.de/europe/monaco-updates")
  }

  test("dsv2: format(osmpbf) reads the fixture, multi-partition == sequential") {
    val df = spark.read.format("osmpbf").option("maxpartitions", "7").load(fixturePath)
    assert(df.schema == OsmPbfDataSource.Schema)
    assert(df.count() == fixtureEntities.length.toLong)
    assert(df.rdd.getNumPartitions > 1, "fixture should split into multiple blob ranges")
    val seqIds = OsmPbf.readAll(fixturePath, conf).map(e => (e.kind, e.id)).toSet
    val dfIds = df.select("kind", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dfIds == seqIds)
    // spot-check a typed row
    val w = df.filter(col("id") === 5000L && col("kind") === "way").collect().head
    assert(w.getAs[Map[String, String]]("tags")("name") == "Way 0")
    assert(w.getSeq[Long](w.fieldIndex("refs")).nonEmpty)
    assert(w.isNullAt(w.fieldIndex("lat")))
  }

  test("dsv2: kind filter pushes to the decoder (group-level skip)") {
    val df = spark.read.format("osmpbf").load(fixturePath).filter(col("kind") === "way")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("pushedKinds=[way]"), s"plan missing pushdown:\n$desc")
    // graft-written files carry per-blob kind hints in the BlobHeader
    // indexdata: non-matching blobs are pruned at PLANNING time
    // (fixture: 1000 nodes at blockSize 300 = 4 node blobs + 1
    // relation blob never fetched)
    assert(desc.contains("prunedBlobs=5"), s"expected 5 pruned blobs:\n$desc")
    assert(df.count() == 120L)
    // a hint-free producer (monaco) prunes nothing but stays correct —
    // covered by the monaco counts test; here verify hints round-trip
    // through the index
    val hints = graft.sources.OsmPbf.indexBlobs(fixturePath, conf)
      .filterNot(_.isHeader).map(_.kindHint)
    assert(hints.count(_ == "node") == 4 && hints.contains("way") && hints.contains("relation"))
  }

  test("dsv2: conjunctive kind filters intersect (not union)") {
    val df = spark.read.format("osmpbf").load(fixturePath)
      .filter(col("kind").isin("node", "way") && col("kind").isin("way", "relation"))
    assert(df.count() == 120L, "only ways satisfy both IN filters")
    val none = spark.read.format("osmpbf").load(fixturePath)
      .filter(col("kind").isin("node") && col("kind").isin("way"))
    assert(none.count() == 0L, "contradictory kind conjuncts must match nothing")
  }

  test("dsv2 write: parallel shards concatenate to one valid pbf") {
    val src = spark.read.format("osmpbf").load(fixturePath)
    val outDir = java.nio.file.Files.createTempDirectory("graft_pbf_w")
    val out = outDir.resolve("out.osm.pbf").toString
    src.repartition(4).write.format("osmpbf").mode("overwrite")
      .option("bbox", "-180,-85,180,85").save(out)
    assert(!new java.io.File(out + ".shards").exists, "shard dir must be cleaned up")
    val back = spark.read.format("osmpbf").load(out)
    assert(back.count() == src.count())
    val a = src.select("kind", "id", "tags", "refs", "user").collect()
      .map(_.toString).sorted.toSeq
    val b = back.select("kind", "id", "tags", "refs", "user").collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
    val h = OsmPbf.readHeader(out, conf).get
    assert(h.left == -180.0 && h.top == 85.0)
    // monaco-grade check: our own reader isn't the only consumer —
    // the blob framing must index cleanly too
    assert(OsmPbf.indexBlobs(out, conf).count(!_.isHeader) >= 4,
      "expected at least one data blob per shard")
  }

  test("dsv2: monaco via spark matches reference counts at partition parallelism") {
    assume(monacoAvailable)
    val df = spark.read.format("osmpbf").option("maxpartitions", "8").load(monacoPath)
    val counts = df.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("node" -> 25423L, "way" -> 4106L, "relation" -> 243L))
  }
}
