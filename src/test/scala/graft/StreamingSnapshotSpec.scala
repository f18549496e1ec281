package graft

import graft.engine.{Docs, Pipeline}
import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sink into versioned snapshots: each micro-batch commits
  * transactionally (write + atomic version-hint rename), so a kill at
  * any point — including mid-snapshot-write — resumes from the
  * checkpoint to an archive identical to the uninterrupted run. */
class StreamingSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val profile = new Pipeline.GraftProfile(4, 4, 4)

  /** Drive one AvailableNow pass over whatever input files exist. */
  private def runOnce(inDir: String, tableDir: String, ckptDir: String): Unit = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    val q = Streams.incrementalTilesVersioned(stream, profile, tableDir, ckptDir, numPartitions = 4)
    q.awaitTermination(120000)
  }

  private def tileSet(df: org.apache.spark.sql.Dataset[_]): Set[(Long, Long)] =
    df.select(col("tile_id"), col("content_hash")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("kill mid-batch, resume from checkpoint: archive equals the uninterrupted run") {
    val root = java.nio.file.Files.createTempDirectory("graft_snapstream").toString
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    // two increments split deterministically by doc hash
    val part1 = docs.where(abs(hash(col("doc_id"))) % 2 === 0)
    val part2 = docs.where(abs(hash(col("doc_id"))) % 2 === 1)

    // --- interrupted run ---
    val in = s"$root/in"
    part1.write.mode("append").parquet(in)
    runOnce(in, s"$root/t", s"$root/ckpt")
    val afterBatch0 = tileSet(Streams.readCommittedTiles(spark, s"$root/t", profile, numPartitions = 4))
    assert(afterBatch0.nonEmpty)

    // simulate a writer killed MID-SNAPSHOT for the next batch: a
    // partial parquet dir exists but the version hint was never
    // renamed into place
    val partialDir = s"$root/t/batch_1/snapshot-1"
    part1.limit(3).write.parquet(partialDir)
    assert(tileSet(Streams.readCommittedTiles(spark, s"$root/t", profile, numPartitions = 4)) == afterBatch0,
      "uncommitted partial snapshot must be invisible to readers")

    // resume: new input file arrives, same checkpoint — batch 1
    // reprocesses, overwrites the partial dir, and commits
    part2.write.mode("append").parquet(in)
    runOnce(in, s"$root/t", s"$root/ckpt")
    val interrupted = tileSet(Streams.readCommittedTiles(spark, s"$root/t", profile, numPartitions = 4))

    // --- uninterrupted control run (same two increments) ---
    val in2 = s"$root/in2"
    part1.write.mode("append").parquet(in2)
    runOnce(in2, s"$root/t2", s"$root/ckpt2")
    part2.write.mode("append").parquet(in2)
    runOnce(in2, s"$root/t2", s"$root/ckpt2")
    val clean = tileSet(Streams.readCommittedTiles(spark, s"$root/t2", profile, numPartitions = 4))

    assert(interrupted == clean, "resumed archive must equal the uninterrupted run")
    assert(interrupted.size > afterBatch0.size, "batch 1 contributed tiles")

    // merge-on-read upsert semantics: a tile coordinate touched by BOTH
    // batches yields ONE assembled row (not one partial tile per batch),
    // and the whole table equals the single-batch run over all docs
    val merged = Streams.readCommittedTiles(spark, s"$root/t", profile, numPartitions = 4)
      .collect()
    assert(merged.map(_.tile_id).distinct.length == merged.length,
      "one row per tile coordinate across batches")
    val batchEquivalent = Pipeline.tiles(docs, profile, numPartitions = 4, gzipTiles = false)
      .collect().map(t => (t.tile_id, t.content_hash)).toSet
    assert(merged.map(t => (t.tile_id, t.content_hash)).toSet == batchEquivalent,
      "incremental table must equal the batch pipeline over the union of docs")
  }

  test("expireSnapshots: old and orphaned-uncommitted versions removed, live kept") {
    val root = java.nio.file.Files.createTempDirectory("graft_expire").toString
    import spark.implicits._
    // four committed versions
    (1 to 4).foreach { i =>
      Pipeline.snapshotVersioned(Seq((i.toLong, s"v$i")).toDS(), s"$root/t", recompute = true)
    }
    // an uncommitted dir beyond the hint (writer died mid-write)
    Seq((99L, "dead")).toDS().write.parquet(s"$root/t/snapshot-9")
    val deleted = Pipeline.expireSnapshots(spark, s"$root/t", keep = 2)
    assert(deleted == Seq(1, 2, 9))
    // live version still reads
    val (back, v) = Pipeline.snapshotVersioned(
      Seq((0L, "unused")).toDS(), s"$root/t")
    assert(v == 4 && back.collect().head._2 == "v4")
    // kept previous version still on disk for time travel
    assert(spark.read.parquet(s"$root/t/snapshot-3").count() == 1)
    assert(!new java.io.File(s"$root/t/snapshot-1").exists())
  }

  test("hint lost in the delete->rename window rolls FORWARD, never back to v=1") {
    val root = java.nio.file.Files.createTempDirectory("graft_snapwin").toString
    import spark.implicits._
    val (_, v1) = Pipeline.snapshotVersioned(Seq((1L, "committed-v1")).toDS(), s"$root/t")
    assert(v1 == 1)
    // simulate a v2 commit that died between delete(hint) and rename:
    // snapshot-2 fully written, tmp hint present, hint file gone
    Seq((2L, "v2")).toDS().write.parquet(s"$root/t/snapshot-2")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/t/.version-hint.2.tmp"),
      "2".getBytes("UTF-8"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/t/version-hint.text"))
    val (back, v) = Pipeline.snapshotVersioned(
      Seq((9L, "SHOULD NOT BE WRITTEN")).toDS(), s"$root/t")
    assert(v == 2 && back.collect().head._2 == "v2")
    // the interrupted commit was completed: hint restored, v1 untouched
    assert(new java.io.File(s"$root/t/version-hint.text").exists())
    assert(spark.read.parquet(s"$root/t/snapshot-1").as[(Long, String)]
      .collect().head._2 == "committed-v1")
  }

  test("re-running a committed batch reads the snapshot instead of recomputing") {
    val root = java.nio.file.Files.createTempDirectory("graft_snapidem").toString
    import spark.implicits._
    val ds = Seq((1L, "a"), (2L, "b")).toDS()
    val (_, v1) = Pipeline.snapshotVersioned(ds, s"$root/t")
    // same table dir again: committed version is read back, not rewritten
    val (back, v2) = Pipeline.snapshotVersioned(
      Seq((9L, "SHOULD NOT BE WRITTEN")).toDS(), s"$root/t")
    assert(v1 == v2)
    assert(back.collect().map(_._1).sorted.toSeq == Seq(1L, 2L))
  }
}
