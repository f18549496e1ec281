package graft.sources

import java.util
import graft.engine.PmtilesArchive
import graft.geo.TileCoord
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * DataSource V2 provider for PMTiles v3 archives —
 * `spark.read.format("pmtiles").load(path)` — with zoom-filter
 * pushdown translated into Hilbert tile-id RANGES: a zoom predicate
 * becomes `[zoomOffset(z), zoomOffset(z+1))`, which the reader passes
 * to the directory walk so leaf directories (and their tile data)
 * outside the window are never fetched — a z14-only scan of a planet
 * archive touches z14 leaves only. Schema and convention match the
 * mbtiles reader — (z, x, y, bytes) with XYZ (top-down) y — so the
 * two formats interchange without a flip; x/y predicates are applied
 * row-wise after the Hilbert decode.
 */
class PmtilesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pmtiles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MbtilesDataSource.Schema
  // writes arrive with the DataFrame's own (TileBytes-shaped) schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PmtilesTable(MbtilesDataSource.pathsOf(new CaseInsensitiveStringMap(properties)), schema)
}

private[sources] class PmtilesTable(paths: Seq[String], schema0: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"pmtiles(${paths.mkString(",")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PmtilesScanBuilder(paths, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new PmtilesWriteBuilder(paths.head, info)
}

/**
 * DSv2 WRITE: `tiles.orderBy("tile_id").write.format("pmtiles")
 * .save(path)`. Each task streams its partition into a shard file
 * (the parallel phase); `commit` verifies the shards' tile-id ranges
 * are DISJOINT AND ASCENDING (i.e. the input was range-partitioned
 * and sorted — `orderBy(tile_id)` gives exactly that) and
 * concatenates them into one valid clustered archive by sequential
 * byte copy. An aborted task deletes its shard; an aborted job leaves
 * the destination untouched.
 *
 * Input schema: the TileBytes columns (tile_id, z, x, y, bytes,
 * feature_count, content_hash).
 */
/** Write options plumbed from `.option(...)` through to the shard
  * writers and the commit-time concatenation, so the header always
  * matches the actual tile bytes (tile_compression in particular). */
private[sources] case class PmtilesWriteOptions(tilesGzipped: Boolean, metadataJson: String,
                                                minZoom: Int, maxZoom: Int)

private[sources] object PmtilesWriteOptions {
  def from(options: CaseInsensitiveStringMap): PmtilesWriteOptions = PmtilesWriteOptions(
    tilesGzipped = Option(options.get("tiles_gzipped")).forall(_.toBoolean),
    metadataJson = Option(options.get("metadata_json")).getOrElse("""{"vector_layers":[]}"""),
    minZoom = Option(options.get("min_zoom")).map(_.toInt).getOrElse(0),
    maxZoom = Option(options.get("max_zoom")).map(_.toInt).getOrElse(15))
}

private[sources] class PmtilesWriteBuilder(
    path: String, info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  override def truncate(): WriteBuilder = this // a fresh archive either way
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new PmtilesBatchWrite(path, info.schema(), PmtilesWriteOptions.from(info.options()))
  }
}

private[sources] case class PmtilesShardMsg(pid: Int, path: String, minId: Long,
                                            maxId: Long, tiles: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/**
 * Shards stage under `<path>.shards/` THROUGH THE HADOOP FILESYSTEM
 * (each task builds its shard in executor-local tmp, then uploads), so
 * the driver-side commit sees them on any cluster topology — the
 * destination just has to be a Hadoop-visible scheme, same contract as
 * every file sink.
 */
private[sources] class PmtilesBatchWrite(path: String, schema: StructType,
                                         opts: PmtilesWriteOptions)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val shardDir = path + ".shards"
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  Seq("tile_id", "z", "x", "y", "bytes", "content_hash").foreach { c =>
    require(schema.fieldNames.contains(c), s"pmtiles write needs column '$c' (TileBytes shape)")
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PmtilesWriterFactory(shardDir, schema, opts, conf)

  private def deleteShardDir(): Unit = {
    val p = new org.apache.hadoop.fs.Path(shardDir)
    p.getFileSystem(conf.value).delete(p, true)
    ()
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case m: PmtilesShardMsg if m.tiles > 0 => m }.sortBy(_.minId)
    shards.sliding(2).foreach {
      case Array(a, b) =>
        require(a.maxId < b.minId,
          s"shard ranges overlap (${a.maxId} >= ${b.minId}): input must be orderBy(tile_id)")
      case _ =>
    }
    // zero shards is legal: a data-dependent empty input still commits
    // a valid zero-tile archive instead of failing the job
    graft.engine.PmtilesArchive.concatenateShards(
      shards.map(_.path).toSeq, path, metadataJson = opts.metadataJson,
      minZoom = opts.minZoom, maxZoom = opts.maxZoom,
      tilesGzipped = opts.tilesGzipped, conf = conf.value)
    deleteShardDir()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteShardDir()
}

private[sources] class PmtilesWriterFactory(shardDir: String, schema: StructType,
                                            opts: PmtilesWriteOptions,
                                            conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new PmtilesDataWriter(shardDir, partitionId, taskId, schema, opts, conf.value)
}

private[sources] class PmtilesDataWriter(shardDir: String, pid: Int, taskId: Long,
                                         schema: StructType, opts: PmtilesWriteOptions,
                                         conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  private val idIdx = schema.fieldIndex("tile_id")
  private val zIdx = schema.fieldIndex("z")
  private val xIdx = schema.fieldIndex("x")
  private val yIdx = schema.fieldIndex("y")
  private val bytesIdx = schema.fieldIndex("bytes")
  private val fcIdx = schema.fieldNames.indexOf("feature_count")
  private val hashIdx = schema.fieldIndex("content_hash")
  // build locally (ShardWriter needs seekable output), upload on commit
  private var localFile: java.io.File = _
  private var writer: graft.engine.PmtilesArchive.ShardWriter = _
  private var n = 0L
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      localFile = java.io.File.createTempFile(f"pmtiles-shard-$pid%05d-$taskId-", ".pmtiles")
      writer = new graft.engine.PmtilesArchive.ShardWriter(
        localFile.getPath, metadataJson = opts.metadataJson,
        minZoom = opts.minZoom, maxZoom = opts.maxZoom, tilesGzipped = opts.tilesGzipped)
    }
    val id = row.getLong(idIdx)
    writer.add(graft.model.TileBytes(id, row.getInt(zIdx), row.getInt(xIdx),
      row.getInt(yIdx), row.getBinary(bytesIdx),
      if (fcIdx >= 0) row.getInt(fcIdx) else 0, row.getLong(hashIdx)))
    n += 1
    if (id < minId) minId = id
    if (id > maxId) maxId = id
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) return PmtilesShardMsg(pid, null, minId, maxId, 0L)
    writer.finish()
    val dst = new org.apache.hadoop.fs.Path(f"$shardDir/part-$pid%05d-$taskId.pmtiles")
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    fs.copyFromLocalFile(true, true, new org.apache.hadoop.fs.Path(localFile.getPath), dst)
    PmtilesShardMsg(pid, dst.toString, minId, maxId, n)
  }

  override def abort(): Unit = {
    if (writer != null) writer.abort()
    if (localFile != null) { localFile.delete(); () }
  }
  override def close(): Unit = ()
}

private[sources] class PmtilesScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _) => MbtilesScan.coordCols(a)
      case GreaterThan(a, _) => MbtilesScan.coordCols(a)
      case GreaterThanOrEqual(a, _) => MbtilesScan.coordCols(a)
      case LessThan(a, _) => MbtilesScan.coordCols(a)
      case LessThanOrEqual(a, _) => MbtilesScan.coordCols(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = {
    val target = Option(options.get("maxpartitions")).map(_.toInt)
      .getOrElse(org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism)
    new PmtilesScan(paths, pushed, math.max(target, 1))
  }
}

private[sources] object PmtilesScan {
  /** Collapse pushed z predicates into the zoom window [minZ, maxZ]. */
  def zoomWindow(pushed: Array[Filter]): (Int, Int) = {
    var minZ = 0
    var maxZ = TileCoord.MaxZoom
    def asInt(o: Any): Int = o match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    pushed.foreach {
      case EqualTo("z", v) => minZ = math.max(minZ, asInt(v)); maxZ = math.min(maxZ, asInt(v))
      case GreaterThan("z", v) => minZ = math.max(minZ, asInt(v) + 1)
      case GreaterThanOrEqual("z", v) => minZ = math.max(minZ, asInt(v))
      case LessThan("z", v) => maxZ = math.min(maxZ, asInt(v) - 1)
      case LessThanOrEqual("z", v) => maxZ = math.min(maxZ, asInt(v))
      case _ =>
    }
    (minZ, maxZ)
  }
}

private[sources] case class PmtilesRangePartition(path: String, lo: Long, hi: Long)
    extends InputPartition

private[sources] class PmtilesScan(paths: Seq[String], pushed: Array[Filter], target: Int)
    extends Scan with Batch {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /**
   * One `InputPartition` per Hilbert tile-id sub-range: the pushed zoom
   * window splits along the archive's own leaf-directory boundaries
   * (driver reads only the ≤16 KB root), so a planet archive scans with
   * cluster-wide parallelism instead of one task per file. Per-reader
   * id clamping keeps run-length entries straddling a boundary
   * exactly-once.
   */
  private lazy val partitions: Array[InputPartition] = {
    val (minZ, maxZ) = PmtilesScan.zoomWindow(pushed)
    if (minZ > maxZ) Array.empty
    else {
      val lo = TileCoord.zoomOffset(minZ)
      val hi = TileCoord.zoomOffset(maxZ + 1) - 1
      val perFile = math.max(1, (target + paths.length - 1) / paths.length)
      paths.flatMap { p =>
        val r = PmtilesArchive.openReader(p, conf.value)
        try r.splitRanges(lo, hi, perFile).map { case (a, b) =>
          PmtilesRangePartition(p, a, b): InputPartition
        } finally r.close()
      }.toArray
    }
  }

  override def readSchema(): StructType = MbtilesDataSource.Schema
  override def toBatch: Batch = this
  override def description(): String = {
    val (lo, hi) = PmtilesScan.zoomWindow(pushed)
    val ranges = partitions.collect { case PmtilesRangePartition(_, a, b) => s"[$a,$b]" }
    val shown = if (ranges.length <= 6) ranges.mkString(" ")
                else (ranges.take(5) :+ s"… ${ranges.length - 5} more").mkString(" ")
    s"pmtiles scan, zooms=[$lo,$hi], rangePartitions=${partitions.length} $shown, " +
      s"pushed=[${pushed.mkString(", ")}]"
  }
  override def planInputPartitions(): Array[InputPartition] = partitions
  override def createReaderFactory(): PartitionReaderFactory =
    new PmtilesReaderFactory(conf, pushed)
}

private[sources] class PmtilesReaderFactory(conf: SerializableConfiguration,
                                            pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PmtilesRangePartition]
    new PmtilesPartitionReader(p.path, p.lo, p.hi, conf.value, pushed)
  }
}

private[sources] class PmtilesPartitionReader(path: String, rangeLo: Long, rangeHi: Long,
                                              conf: org.apache.hadoop.conf.Configuration,
                                              pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val reader = PmtilesArchive.openReader(path, conf)
  private val iter: Iterator[(Int, Int, Int, Array[Byte])] = {
    // clamp to this partition's sub-range: a run-length entry that
    // straddles a split boundary contributes only its in-range ids here
    val lo = rangeLo
    val hi = rangeHi
    if (lo > hi) Iterator.empty
    else {
      reader.entriesInRange(lo, hi).flatMap { e =>
        // decide which ids survive the pushed x/y/z filters BEFORE
        // fetching bytes — a single-tile point lookup must not read
        // every blob in the partition's directory range
        val run = math.max(e.runLength, 1)
        val surviving = (0 until run).iterator
          .map(i => e.tileId + i)
          .filter(id => id >= lo && id <= hi)
          .map { id =>
            val (x, y, z) = TileCoord.decodeHilbert(id)
            (z, x, y)
          }
          .filter { case (z, x, y) => pushed.forall(MbtilesScan.matches(_, z, x, y)) }
          .toArray
        if (surviving.isEmpty) Iterator.empty
        else {
          val bytes = reader.tileData(e)
          surviving.iterator.map { case (z, x, y) => (z, x, y, bytes) }
        }
      }
    }
  }
  private var cur: (Int, Int, Int, Array[Byte]) = _
  override def next(): Boolean =
    if (iter.hasNext) { cur = iter.next(); true } else false
  override def get(): InternalRow = InternalRow(cur._1, cur._2, cur._3, cur._4)
  override def close(): Unit = reader.close()
}
