package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * Shared DSv2 surface for the per-file vector sources, completing the
 * `format(...)` family (osmpbf/mbtiles/pmtiles already have one):
 *
 *   spark.read.format("shapefile").load("/data/ne.shp" | dir)
 *   spark.read.format("geopackage").load("/data/x.gpkg")
 *
 * Both decode executor-side via the existing from-scratch parsers
 * ([[Shapefile.readOne]], [[GeoPackage.readDb]]) with one
 * `InputPartition` per file — the natural parallel unit for these
 * formats (a shapefile's .shx/.dbf pair with side files, a gpkg's
 * page tree). Schema is the FeatureRow shape:
 * (source STRING, fid LONG, geom BINARY wkb-wgs84, attrs MAP).
 */
private[sources] object VectorFileDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("fid", LongType, nullable = false),
    StructField("geom", BinaryType, nullable = true),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** File-or-directory expansion by suffix — THE one copy shared by
    * the per-file providers (and [[Shapefile.listShp]] delegates here). */
  def listBySuffix(path: String, suffix: String,
                   conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isFile) Seq(path)
    else fs.listStatus(p).toSeq.map(_.getPath.toString).filter(_.endsWith(suffix)).sorted
  }

  def toRow(source: String, fid: Long, geom: Array[Byte],
            attrs: Map[String, String]): InternalRow = {
    val ks = attrs.keys.toArray
    InternalRow(
      UTF8String.fromString(source), fid, geom,
      new ArrayBasedMapData(
        new GenericArrayData(ks.map(k => UTF8String.fromString(k): Any)),
        new GenericArrayData(ks.map(k => UTF8String.fromString(attrs(k)): Any))))
  }
}

private[sources] abstract class VectorFileTableProvider(short: String)
    extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister
    with Serializable {
  /** Expand a load path into the per-partition file list. */
  def filesOf(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String]
  /** Decode one file into rows. */
  def readFile(file: String, conf: org.apache.hadoop.conf.Configuration,
               options: Map[String, String]): Iterator[InternalRow]

  override def shortName(): String = short
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VectorFileDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    new Table with SupportsRead {
      override def name(): String = short
      override def schema(): StructType = VectorFileDataSource.Schema
      override def capabilities(): util.Set[TableCapability] =
        Set(TableCapability.BATCH_READ).asJava
      override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
        // the load path rides on the scan options; table properties
        // carry it only on some call paths
        val merged = new util.HashMap[String, String](properties)
        merged.putAll(scanOptions.asCaseSensitiveMap())
        val mergedMap = new CaseInsensitiveStringMap(merged)
        // lowercase the option keys so executor-side lookups (e.g.
        // "table") stay case-insensitive like every other DSv2 option
        val optMap = merged.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap
        () => new VectorFileScan(VectorFileTableProvider.this,
          MbtilesDataSource.pathsOf(mergedMap), optMap)
      }
    }
  }
}

private[sources] case class VectorFilePartition(file: String) extends InputPartition

private[sources] class VectorFileScan(provider: VectorFileTableProvider,
                                      paths: Seq[String], options: Map[String, String])
    extends Scan with Batch {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  // list the filesystem ONCE per scan: planInputPartitions is called by
  // Spark and again by description() (EXPLAIN / UI), and each remote
  // listStatus would otherwise repeat
  private lazy val partitions: Array[InputPartition] =
    paths.flatMap(provider.filesOf(_, conf.value))
      .map(f => VectorFilePartition(f): InputPartition).toArray
  override def readSchema(): StructType = VectorFileDataSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = partitions
  override def description(): String =
    s"${provider.shortName()} scan, filePartitions=${partitions.length}"
  override def createReaderFactory(): PartitionReaderFactory = {
    val p = provider
    val c = conf
    val o = options
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val iter = p.readFile(partition.asInstanceOf[VectorFilePartition].file, c.value, o)
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (iter.hasNext) { cur = iter.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** `spark.read.format("shapefile")` — one partition per .shp. */
class ShapefileDataSource extends VectorFileTableProvider("shapefile") {
  override def filesOf(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    VectorFileDataSource.listBySuffix(path, ".shp", conf)
  override def readFile(file: String, conf: org.apache.hadoop.conf.Configuration,
                        options: Map[String, String]): Iterator[InternalRow] =
    Shapefile.readOne(file, conf).iterator.map { r =>
      VectorFileDataSource.toRow(r.path, r.record.toLong, r.geom, r.attrs)
    }
}

/** `spark.read.format("geopackage")` — one partition per .gpkg;
  * `.option("table", name)` restricts to one feature table. */
class GeoPackageDataSource extends VectorFileTableProvider("geopackage") {
  override def filesOf(path: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    VectorFileDataSource.listBySuffix(path, ".gpkg", conf)
  override def readFile(file: String, conf: org.apache.hadoop.conf.Configuration,
                        options: Map[String, String]): Iterator[InternalRow] = {
    val db = Sqlite.open(file, conf)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => db.close()))
    GeoPackage.readDb(db, options.get("table")).map { r =>
      VectorFileDataSource.toRow(r.table, r.fid, r.geom, r.attrs)
    }
  }
}
