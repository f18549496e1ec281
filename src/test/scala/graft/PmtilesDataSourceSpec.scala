package graft

import graft.engine.PmtilesArchive
import graft.geo.TileCoord
import graft.model.TileBytes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object PmtilesDataSourceSpec {
  // cross-task registry so the injected crash fires exactly once
  val crashed = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
}

/** DSv2 pmtiles reader: zoom predicates become Hilbert tile-id ranges
  * that prune leaf directories before any tile data is fetched. */
class PmtilesDataSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def writeArchive(): (String, Int, Int) = {
    import spark.implicits._
    // z5..z7 full pyramids (21504 unique entries): enough to force a
    // root/leaf split in the v3 directory layout
    val tiles = (for {
      z <- 5 to 7
      x <- 0 until (1 << z)
      y <- 0 until (1 << z)
    } yield {
      val id = TileCoord.encodeHilbert(x, y, z)
      TileBytes(id, z, x, y,
        Array(z.toByte, (x >> 8).toByte, x.toByte, (y >> 8).toByte, y.toByte), 1, id)
    }).sortBy(_.tile_id)
    val ds = tiles.toDS().coalesce(1).sortWithinPartitions("tile_id")
    val path = java.nio.file.Files.createTempDirectory("graft_pmds").toString + "/a.pmtiles"
    PmtilesArchive.write(ds, path, tilesGzipped = false)
    (path, 1024, 4096)  // z5, z6 counts (plus 16384 z7)
  }

  test("zoom filter prunes to the id window; content round-trips") {
    val (path, n5, n6) = writeArchive()
    // the archive really has leaf directories (pruning is meaningful)
    val r = new PmtilesArchive.Reader(path)
    assert(r.header.leafDirectoriesLength > 0, "expected a root/leaf split")
    r.close()

    val df = spark.read.format("pmtiles").load(path)
    assert(df.count() == n5 + n6 + 16384)
    val z5 = df.where(col("z") === 5)
    val scanDesc = z5.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec"))
    assert(scanDesc.contains("zooms=[5,5]"), s"zoom window not pushed: $scanDesc")
    assert(z5.count() == n5)
    // exact tile content parity for a sampled tile
    val row = z5.where(col("x") === 3 && col("y") === 17).collect().head
    assert(row.getAs[Array[Byte]]("bytes").toSeq ==
      Seq(5.toByte, 0.toByte, 3.toByte, 0.toByte, 17.toByte))
    // x/y predicates still filter correctly (row-wise)
    assert(df.where(col("z") === 6 && col("x") === 0).count() == 64)
  }

  test("DSv2 write: orderBy(tile_id).write.format(pmtiles) -> one valid clustered archive") {
    import spark.implicits._
    val n = 3000
    val tiles = (0 until n).map { i =>
      val z = 6
      val x = i % 64
      val y = i / 64
      val id = TileCoord.encodeHilbert(x, y, z)
      TileBytes(id, z, x, y, Array(x.toByte, y.toByte, (i % 3).toByte), 1, id)
    }
    val out = java.nio.file.Files.createTempDirectory("graft_pmw").toString + "/w.pmtiles"
    // orderBy = range partition + sort: exactly the disjoint-ascending
    // shards the commit-time concatenation requires; these tiles are
    // raw (not gzipped), so the option must reach the header
    tiles.toDF().repartition(4).orderBy("tile_id")
      .write.format("pmtiles").mode("overwrite")
      .option("tiles_gzipped", "false")
      .option("metadata_json", """{"vector_layers":[],"note":"opt"}""")
      .save(out)
    assert(new java.io.File(out).isFile)
    assert(!new java.io.File(out + ".shards").exists(), "shard staging cleaned up")
    val hdrReader = new PmtilesArchive.Reader(out)
    assert(hdrReader.header.tileCompression == 1,
      "tiles_gzipped=false must set tile_compression=none in the header")
    assert(hdrReader.metadata.contains("\"note\":\"opt\""), "metadata_json option plumbed")
    hdrReader.close()
    val back = spark.read.format("pmtiles").load(out)
    assert(back.count() == n)
    val r = back.where(col("x") === 5 && col("y") === 11).collect().head
    // DSv2 write path gzips tile data on concatenation metadata; raw
    // bytes round-trip as written
    assert(r.getAs[Array[Byte]]("bytes").toSeq.take(2) == Seq(5.toByte, 11.toByte))
    // unsorted input MUST be rejected (shard-order invariant)
    val bad = intercept[Exception] {
      tiles.reverse.toDF().coalesce(1)
        .write.format("pmtiles").mode("overwrite").save(out + "2")
    }
    assert(bad.getMessage != null)
  }

  test("DSv2 write: empty input commits a valid zero-tile archive") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_pmempty").toString + "/e.pmtiles"
    Seq.empty[TileBytes].toDF()
      .write.format("pmtiles").mode("overwrite").save(out)
    assert(new java.io.File(out).isFile)
    assert(spark.read.format("pmtiles").load(out).count() == 0)
  }

  test("DSv2 write survives a task retry: failed shard aborted, rerun commits clean") {
    import spark.implicits._
    PmtilesDataSourceSpec.crashed.clear()
    val n = 800
    val tiles = (0 until n).map { i =>
      val id = TileCoord.encodeHilbert(i % 32, i / 32, 5)
      TileBytes(id, 5, i % 32, i / 32, Array(i.toByte, (i >> 8).toByte), 1, id)
    }
    val flaky = tiles.toDF().repartition(4).orderBy("tile_id").as[TileBytes]
      .mapPartitions { it =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.attemptNumber() == 0 && tc.partitionId() == 1 &&
          PmtilesDataSourceSpec.crashed.putIfAbsent(tc.partitionId(), true) == null) {
          // throw MID-ITERATION so the shard writer has already
          // consumed rows — the abort path (partial-shard delete)
          // actually runs before the retry
          var count = 0
          it.map { r =>
            count += 1
            if (count == 10) throw new RuntimeException("injected task failure mid-shard")
            r
          }
        } else it
      }
    val out = java.nio.file.Files.createTempDirectory("graft_pmretry").toString + "/r.pmtiles"
    flaky.toDF().write.format("pmtiles").mode("overwrite").save(out)
    assert(!new java.io.File(out + ".shards").exists(), "staging cleaned up")
    val back = spark.read.format("pmtiles").load(out)
    assert(back.count() == n, "retried shard contributed exactly once")
  }

  test("parallel read: zoom window splits into range partitions along leaf boundaries") {
    val (path, n5, n6) = writeArchive()
    val df = spark.read.format("pmtiles").option("maxpartitions", "8").load(path)
    // a multi-zoom archive with leaf directories must plan >1 partition
    assert(df.rdd.getNumPartitions >= 4,
      s"expected >=4 range partitions, got ${df.rdd.getNumPartitions}")
    val scanDesc = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec"))
    assert(scanDesc.contains("rangePartitions="), s"ranges not in description: $scanDesc")
    // identical row set vs the single-partition read (exactly-once
    // across split boundaries)
    val single = spark.read.format("pmtiles").option("maxpartitions", "1").load(path)
    assert(single.rdd.getNumPartitions == 1)
    assert(df.count() == single.count())
    assert(df.exceptAll(single).count() == 0 && single.exceptAll(df).count() == 0)
    // a pushed zoom window still prunes, and splits within the window
    val z6 = spark.read.format("pmtiles").option("maxpartitions", "8").load(path)
      .where(col("z") === 6)
    assert(z6.rdd.getNumPartitions >= 2)
    assert(z6.count() == n6)
  }

  test("parallel read: run-length entries expand exactly-once across range partitions") {
    import spark.implicits._
    // identical blobs in 37-id blocks -> the writer coalesces each
    // block into one run-length entry; split boundaries land at entry
    // starts and every id must come back exactly once after expansion
    val z = 5
    val tiles = (for {
      x <- 0 until (1 << z); y <- 0 until (1 << z)
    } yield {
      val id = TileCoord.encodeHilbert(x, y, z)
      TileBytes(id, z, x, y, Array((id / 37).toByte), 1, id / 37)
    }).sortBy(_.tile_id)
    val path = java.nio.file.Files.createTempDirectory("graft_pmrun").toString + "/runs.pmtiles"
    PmtilesArchive.write(tiles.toDS().coalesce(1).sortWithinPartitions("tile_id"),
      path, tilesGzipped = false)
    val r = new PmtilesArchive.Reader(path)
    assert(r.allEntries.exists(_.runLength > 1), "fixture must contain run-length entries")
    r.close()
    val df = spark.read.format("pmtiles").option("maxpartitions", "6").load(path)
    assert(df.rdd.getNumPartitions > 1)
    val rows = df.select("z", "x", "y").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == 1024 && rows.distinct.length == 1024)
  }

  test("hadoop-path reader: file:// scheme works") {
    val (path, n5, n6) = writeArchive()
    val reader = PmtilesArchive.openReader("file://" + path,
      spark.sparkContext.hadoopConfiguration)
    try {
      val lo = TileCoord.zoomOffset(6)
      val hi = TileCoord.zoomOffset(7) - 1
      val ids = reader.entriesInRange(lo, hi).toSeq
        .flatMap(e => (0 until math.max(e.runLength, 1)).map(e.tileId + _))
        .filter(id => id >= lo && id <= hi)
      assert(ids.size == n6)
    } finally reader.close()
  }
}
