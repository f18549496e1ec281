package graft.streaming

import graft.engine.{Docs, Pipeline, Profile, TileAssembler}
import graft.model.TileBytes
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Structured-Streaming surface of the engine (SURVEY §2.9). The
 * reference is pure batch; the Spark build adds the incremental path:
 * watermarked windowed aggregation, stateful sessionization, and an
 * incremental docs->tiles ingest via foreachBatch (each micro-batch
 * runs the normal batch pipeline and upserts tiles — resumable from
 * the checkpoint dir after executor loss).
 */
object Streams {

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> event-time type
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("v"))
      .select(col("window.start").as("win"), col("event_type"), col("n"), col("v"))

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessionAgg(user_id: Long, events: Long, start_ts: Long, last_ts: Long)

  /**
   * Gap-based sessionization with flatMapGroupsWithState: a session
   * closes when a later event arrives past the gap, OR — in streaming
   * mode — when the group sits idle for `gapSeconds` of processing
   * time (the timeout emits the stored session and clears its state,
   * so one-shot users cannot pin state forever). In a batch run
   * timeouts never fire (Spark's contract), so the trailing open
   * session per user is not emitted — the streaming analog of the
   * batch q31.
   */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionAgg](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            // idle past the gap: close and emit the stored session
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            var cur = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime / 1000
              if (cur == null) cur = SessionAgg(userId, 1, t, t)
              else if (t - cur.last_ts > gapSeconds) {
                closed += cur
                cur = SessionAgg(userId, 1, t, t)
              } else cur = cur.copy(events = cur.events + 1,
                // sorting is per-micro-batch only: a LATE event from a
                // later batch merges into the stored session but must
                // not rewind its frontier (last_ts) — that would make
                // the next on-time event look past-gap and split the
                // session spuriously. Extend both edges monotonically.
                start_ts = math.min(cur.start_ts, t),
                last_ts = math.max(cur.last_ts, t))
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutDuration(gapSeconds * 1000)
            }
            closed.iterator
          }
      }
  }

  /**
   * Incremental ingest with TRANSACTIONAL batches: each micro-batch's
   * RENDERED FEATURES (the pre-assembly Kv rows) commit as a versioned
   * snapshot under `tableDir/batch_<id>` via
   * [[Pipeline.snapshotVersioned]] (write, then atomic version-hint
   * rename). foreachBatch can re-run a batch after a failure, so the
   * sink must be idempotent per batch id — and it is: a batch whose
   * snapshot committed is read back instead of recomputed, while a
   * batch that died mid-write left no hint, so readers never saw the
   * partial output and the re-run overwrites it.
   *
   * Snapshotting FEATURES rather than finished tiles is what makes the
   * table upsert-correct: a tile coordinate touched by several batches
   * is assembled ONCE, at read time, over the union of all committed
   * features — per-tile merge, label-grid limits, and dedup see the
   * full feature set, exactly as the uninterrupted batch run would.
   * (Per-batch tile snapshots would leave two partial byte blobs for
   * the same coordinate, which no reader can merge losslessly.)
   * End-to-end: kill at ANY point, restart from the checkpoint, and
   * [[readCommittedTiles]] equals the uninterrupted run.
   *
   * Caveat: a profile with `sources`/`finish` emits its flush features
   * once per BATCH here (the batch pipeline emits them once per run) —
   * acceptable for summary/watermark features, but finish-heavy
   * profiles should dedup in postProcess.
   */
  def incrementalTilesVersioned(docsStream: DataFrame, profile: Profile,
                                tableDir: String, checkpointDir: String,
                                numPartitions: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import batch.sparkSession.implicits._
          val rendered = Pipeline.renderedFromDocs(batch, profile, rebalance = numPartitions)
          Pipeline.snapshotVersioned(rendered, s"$tableDir/batch_$batchId")
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Assemble final tiles from all COMMITTED batch snapshots under
    * `tableDir` (merge-on-read): union the committed rendered-feature
    * snapshots, then run the normal distributed tile assembly once, so
    * tiles spanning batches merge exactly as in a batch run. Batch
    * dirs whose writer died before the version-hint rename are
    * invisible (the hint probe shares [[Pipeline.committedVersion]],
    * including its roll-forward of a commit interrupted between the
    * hint delete and rename). */
  def readCommittedTiles(spark: SparkSession, tableDir: String,
                         profile: Profile = new Pipeline.GraftProfile(),
                         numPartitions: Int = 8,
                         gzipTiles: Boolean = false): Dataset[TileBytes] = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(tableDir)
    val fs = base.getFileSystem(conf)
    val snapshots: Seq[String] =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
        .sortBy(_.getPath.getName)
        .flatMap { s =>
          Pipeline.committedVersion(fs, s.getPath).map(v => s"${s.getPath}/snapshot-$v")
        }
    if (snapshots.isEmpty)
      spark.emptyDataset(org.apache.spark.sql.Encoders.product[TileBytes])
    else
      TileAssembler.assemble(
        spark.read.parquet(snapshots: _*).as[graft.engine.Kv],
        profile, numPartitions, gzipTiles)
  }

  /**
   * Incremental ingest: a stream of docs rows -> per-micro-batch tile
   * build appended to `outDir` (files archive layout). Checkpointed:
   * a restart resumes from the last committed batch.
   */
  def incrementalTiles(docsStream: DataFrame, profile: Profile,
                       outDir: String, checkpointDir: String,
                       numPartitions: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val tiles = Pipeline.tiles(batch, profile, numPartitions, gzipTiles = false)
          TileAssembler.writeFilesArchive(tiles, s"$outDir/batch_$batchId")
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
