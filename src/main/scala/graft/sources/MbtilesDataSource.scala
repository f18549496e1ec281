package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * DataSource V2 provider for MBTiles archives —
 * `spark.read.format("mbtiles").load(path)` — the idiomatic Spark
 * surface over the from-scratch [[Sqlite]] parser: TableProvider →
 * ScanBuilder (with z/x/y comparison-filter pushdown — the pruned
 * filters skip tile rows before blob bytes are materialized) → one
 * input partition per archive file, opened executor-side through the
 * Hadoop FileSystem.
 *
 * Schema: z INT, x INT, y INT (TMS row as stored), bytes BINARY.
 * Compact map+images archives resolve blobs through an in-reader map
 * (single-file convenience path; the distributed two-scan join lives
 * in [[MbtilesReader.read]]).
 */
class MbtilesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mbtiles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MbtilesDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MbtilesTable(MbtilesDataSource.pathsOf(new CaseInsensitiveStringMap(properties)))
}

object MbtilesDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("z", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  private[sources] def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { json =>
      // DataFrameReader.load(paths*) passes a JSON string array
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      (0 until n.size()).map(n.get(_).asText())
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "mbtiles: no path given (use .load(path))")
    all
  }
}

private[sources] class MbtilesTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"mbtiles(${paths.mkString(",")})"
  override def schema(): StructType = MbtilesDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MbtilesScanBuilder(paths, options)
}

private[sources] class MbtilesScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  /** Accept z/x/y comparison filters; everything else stays with
    * Spark. Pushed filters skip rows inside the reader before the
    * blob column is materialized. */
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
    new MbtilesScan(paths, pushed, math.max(target, 1))
  }
}

private[sources] object MbtilesScan {
  def coordCols(name: String): Boolean =
    name == "z" || name == "x" || name == "y"

  def matches(f: Filter, z: Int, x: Int, y: Int): Boolean = {
    def v(name: String): Int = name match {
      case "z" => z
      case "x" => x
      case "y" => y
    }
    def asInt(o: Any): Int = o match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    f match {
      case EqualTo(a, b) => v(a) == asInt(b)
      case GreaterThan(a, b) => v(a) > asInt(b)
      case GreaterThanOrEqual(a, b) => v(a) >= asInt(b)
      case LessThan(a, b) => v(a) < asInt(b)
      case LessThanOrEqual(a, b) => v(a) <= asInt(b)
      case _ => true
    }
  }
}

private[sources] class MbtilesScan(paths: Seq[String], pushed: Array[Filter], target: Int)
    extends Scan with Batch {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /**
   * One `InputPartition` per rowid sub-range of the archive's own
   * b-tree: the driver reads only the interior-page fringe
   * ([[Sqlite.Db.splitKeys]]) to pick split rowids, so a planet-scale
   * archive scans with cluster-wide parallelism. Plain schema splits
   * the `tiles` table; compact schema splits `images` (the heavy blob
   * pages are then read exactly once fleet-wide — each partition
   * re-walks only the narrow `map` table to find its blobs' addresses).
   */
  private lazy val partitions: Array[InputPartition] = {
    val perFile = math.max(1, (target + paths.length - 1) / paths.length)
    paths.flatMap { p =>
      val db = Sqlite.open(p, conf.value)
      try {
        val plain = db.tableRoot("tiles").isDefined
        val table = if (plain) "tiles" else "images"
        val keys = db.tableRoot(table) match {
          case Some(root) if perFile > 1 => db.splitKeys(root, perFile)
          case _ => Seq.empty[Long]
        }
        val los = Long.MinValue +: keys.map(_ + 1)
        val his = keys :+ Long.MaxValue
        los.zip(his).map { case (lo, hi) =>
          MbtilesInputPartition(p, plain, lo, hi): InputPartition
        }
      } finally db.close()
    }.toArray
  }

  override def readSchema(): StructType = MbtilesDataSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"mbtiles scan, rangePartitions=${partitions.length}, pushed=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory =
    new MbtilesReaderFactory(conf, pushed)
}

private[sources] case class MbtilesInputPartition(path: String, plain: Boolean,
                                                  lo: Long, hi: Long) extends InputPartition

private[sources] class MbtilesReaderFactory(conf: SerializableConfiguration,
                                            pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MbtilesInputPartition]
    new MbtilesPartitionReader(p.path, p.plain, p.lo, p.hi, conf.value, pushed)
  }
}

private[sources] class MbtilesPartitionReader(path: String, plain: Boolean,
                                              lo: Long, hi: Long,
                                              conf: org.apache.hadoop.conf.Configuration,
                                              pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val db = Sqlite.open(path, conf)
  private val iter: Iterator[(Int, Int, Int, Array[Byte])] =
    if (plain) {
      db.rowsRange("tiles", lo, hi).map { case (_, m) =>
        (m("zoom_level").asInstanceOf[Long].toInt,
          m("tile_column").asInstanceOf[Long].toInt,
          m("tile_row").asInstanceOf[Long].toInt,
          m("tile_data").asInstanceOf[Array[Byte]])
      }
    } else {
      // compact schema: this partition owns an `images` rowid range —
      // load those blobs once, then emit every `map` row that points at
      // one of them (a map row's tile_id lives in exactly one images
      // partition, so the union over partitions is exact)
      lazy val images = db.rowsRange("images", lo, hi).map { case (_, m) =>
        m("tile_id").toString -> m("tile_data").asInstanceOf[Array[Byte]]
      }.toMap
      db.rows("map").flatMap { case (_, m) =>
        images.get(m("tile_id").toString).map { bytes =>
          (m("zoom_level").asInstanceOf[Long].toInt,
            m("tile_column").asInstanceOf[Long].toInt,
            m("tile_row").asInstanceOf[Long].toInt,
            bytes)
        }
      }
    }
  private val filtered = iter.filter { case (z, x, y, _) =>
    pushed.forall(MbtilesScan.matches(_, z, x, y))
  }
  private var cur: (Int, Int, Int, Array[Byte]) = _

  override def next(): Boolean =
    if (filtered.hasNext) { cur = filtered.next(); true } else false

  override def get(): InternalRow =
    InternalRow(cur._1, cur._2, cur._3, cur._4)

  override def close(): Unit = db.close()
}
