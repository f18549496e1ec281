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
 * archive touches z14 leaves only. Schema matches the mbtiles format
 * (z, x, y, bytes); x/y predicates are applied row-wise after the
 * Hilbert decode.
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
    new PmtilesScanBuilder(paths)
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
private[sources] class PmtilesWriteBuilder(
    path: String, info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  override def truncate(): WriteBuilder = this // a fresh archive either way
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new PmtilesBatchWrite(path, info.schema())
  }
}

private[sources] case class PmtilesShardMsg(pid: Int, path: String, minId: Long,
                                            maxId: Long, tiles: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class PmtilesBatchWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val shardDir = path + ".shards"
  Seq("tile_id", "z", "x", "y", "bytes", "content_hash").foreach { c =>
    require(schema.fieldNames.contains(c), s"pmtiles write needs column '$c' (TileBytes shape)")
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PmtilesWriterFactory(shardDir, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case m: PmtilesShardMsg if m.tiles > 0 => m }.sortBy(_.minId)
    shards.sliding(2).foreach {
      case Array(a, b) =>
        require(a.maxId < b.minId,
          s"shard ranges overlap (${a.maxId} >= ${b.minId}): input must be orderBy(tile_id)")
      case _ =>
    }
    require(shards.nonEmpty, "no tiles written")
    graft.engine.PmtilesArchive.concatenateShards(
      shards.map(_.path).toSeq, path, tilesGzipped = true)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(shardDir))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(shardDir))
    ()
  }
}

private[sources] class PmtilesWriterFactory(shardDir: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new PmtilesDataWriter(shardDir, partitionId, taskId, schema)
}

private[sources] class PmtilesDataWriter(shardDir: String, pid: Int, taskId: Long,
                                         schema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  private val idIdx = schema.fieldIndex("tile_id")
  private val zIdx = schema.fieldIndex("z")
  private val xIdx = schema.fieldIndex("x")
  private val yIdx = schema.fieldIndex("y")
  private val bytesIdx = schema.fieldIndex("bytes")
  private val fcIdx = schema.fieldNames.indexOf("feature_count")
  private val hashIdx = schema.fieldIndex("content_hash")
  new java.io.File(shardDir).mkdirs()
  private val path = f"$shardDir/part-$pid%05d-$taskId.pmtiles"
  private var writer: graft.engine.PmtilesArchive.ShardWriter = _
  private var n = 0L
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue

  override def write(row: InternalRow): Unit = {
    if (writer == null) writer = new graft.engine.PmtilesArchive.ShardWriter(path)
    val id = row.getLong(idIdx)
    writer.add(graft.model.TileBytes(id, row.getInt(zIdx), row.getInt(xIdx),
      row.getInt(yIdx), row.getBinary(bytesIdx),
      if (fcIdx >= 0) row.getInt(fcIdx) else 0, row.getLong(hashIdx)))
    n += 1
    if (id < minId) minId = id
    if (id > maxId) maxId = id
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.finish()
    PmtilesShardMsg(pid, if (writer == null) null else path, minId, maxId, n)
  }

  override def abort(): Unit = if (writer != null) writer.abort()
  override def close(): Unit = ()
}

private[sources] class PmtilesScanBuilder(paths: Seq[String])
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
  override def build(): Scan = new PmtilesScan(paths, pushed)
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

private[sources] class PmtilesScan(paths: Seq[String], pushed: Array[Filter])
    extends Scan with Batch {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  override def readSchema(): StructType = MbtilesDataSource.Schema
  override def toBatch: Batch = this
  override def description(): String = {
    val (lo, hi) = PmtilesScan.zoomWindow(pushed)
    s"pmtiles scan, zooms=[$lo,$hi], pushed=[${pushed.mkString(", ")}]"
  }
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => MbtilesInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PmtilesReaderFactory(conf, pushed)
}

private[sources] class PmtilesReaderFactory(conf: SerializableConfiguration,
                                            pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[MbtilesInputPartition].path
    new PmtilesPartitionReader(path, conf.value, pushed)
  }
}

private[sources] class PmtilesPartitionReader(path: String,
                                              conf: org.apache.hadoop.conf.Configuration,
                                              pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val reader = PmtilesArchive.openReader(path, conf)
  private val (minZ, maxZ) = PmtilesScan.zoomWindow(pushed)
  private val iter: Iterator[(Int, Int, Int, Array[Byte])] =
    if (minZ > maxZ) Iterator.empty
    else {
      val lo = TileCoord.zoomOffset(minZ)
      val hi = TileCoord.zoomOffset(maxZ + 1) - 1
      reader.entriesInRange(lo, hi).flatMap { e =>
        val bytes = reader.tileData(e)
        val run = math.max(e.runLength, 1)
        (0 until run).iterator
          .map(i => e.tileId + i)
          .filter(id => id >= lo && id <= hi)
          .map { id =>
            val (x, y, z) = TileCoord.decodeHilbert(id)
            (z, x, y, bytes)
          }
      }.filter { case (z, x, y, _) =>
        pushed.forall(MbtilesScan.matches(_, z, x, y))
      }
    }
  private var cur: (Int, Int, Int, Array[Byte]) = _
  override def next(): Boolean =
    if (iter.hasNext) { cur = iter.next(); true } else false
  override def get(): InternalRow = InternalRow(cur._1, cur._2, cur._3, cur._4)
  override def close(): Unit = reader.close()
}
