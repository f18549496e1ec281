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
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PmtilesTable(MbtilesDataSource.pathsOf(new CaseInsensitiveStringMap(properties)))
}

private[sources] class PmtilesTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"pmtiles(${paths.mkString(",")})"
  override def schema(): StructType = MbtilesDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PmtilesScanBuilder(paths)
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
