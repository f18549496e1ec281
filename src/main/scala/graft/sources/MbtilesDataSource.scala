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
 * Schema: z INT, x INT, y INT, bytes BINARY. y is XYZ (top-down) —
 * the stored TMS `tile_row` is flipped on read, so write → read is a
 * true round trip and the pmtiles reader's convention matches.
 * Compact map+images archives resolve blobs through an in-reader map
 * (single-file convenience path; the distributed two-scan join lives
 * in [[MbtilesReader.read]]).
 */
class MbtilesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mbtiles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MbtilesDataSource.Schema
  // writes arrive with the DataFrame's own (TileBytes-shaped) schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MbtilesTable(MbtilesDataSource.pathsOf(new CaseInsensitiveStringMap(properties)), schema)
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

private[sources] class MbtilesTable(paths: Seq[String], schema0: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"mbtiles(${paths.mkString(",")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MbtilesScanBuilder(paths, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new MbtilesWriteBuilder(paths.head, info)
}

/**
 * DSv2 WRITE: `tiles.orderBy("tile_id").write.format("mbtiles")
 * .save(path)` — the mirror of the pmtiles write path. Each task
 * streams its (sorted, range-partitioned) partition into a framed
 * binary shard through the Hadoop FileSystem; `commit` verifies the
 * shards' tile-id ranges are DISJOINT AND ASCENDING and drains them in
 * order through the existing [[graft.engine.SqliteStreamWriter]]-based
 * archive drain (SQLite pages interleave across tables, so the final
 * page build is inherently one sequential writer — the parallel phase
 * did the per-row work, the commit is a straight byte pass).
 *
 * Metadata rows come from `.option("meta.<name>", value)`.
 * Input schema: the TileBytes columns (tile_id, z, x, y, bytes,
 * content_hash[, feature_count]).
 */
private[sources] class MbtilesWriteBuilder(
    path: String, info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  override def truncate(): WriteBuilder = this // a fresh archive either way
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      // asCaseSensitiveMap preserves the caller's key case —
      // CaseInsensitiveStringMap.entrySet would lowercase
      // `.option("meta.myKey", v)` into metadata name "mykey"
      val metadata = info.options().asCaseSensitiveMap().asScala
        .filter { case (k, _) => k.toLowerCase.startsWith("meta.") }
        .map { case (k, v) => k.substring(5) -> v }
        .toMap
      new MbtilesBatchWrite(path, info.schema(), metadata)
    }
  }
}

private[sources] case class MbtilesShardMsg(pid: Int, path: String, minId: Long,
                                            maxId: Long, tiles: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class MbtilesBatchWrite(path: String, schema: StructType,
                                         metadata: Map[String, String])
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val shardDir = path + ".shards"
  private val conf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  Seq("tile_id", "z", "x", "y", "bytes", "content_hash").foreach { c =>
    require(schema.fieldNames.contains(c), s"mbtiles write needs column '$c' (TileBytes shape)")
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MbtilesWriterFactory(shardDir, schema, conf)

  private def deleteShardDir(): Unit = {
    val p = new org.apache.hadoop.fs.Path(shardDir)
    p.getFileSystem(conf.value).delete(p, true)
    ()
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case m: MbtilesShardMsg if m.tiles > 0 => m }.sortBy(_.minId)
    shards.sliding(2).foreach {
      case Array(a, b) =>
        require(a.maxId < b.minId,
          s"shard ranges overlap (${a.maxId} >= ${b.minId}): input must be orderBy(tile_id)")
      case _ =>
    }
    // zero shards is legal: a data-dependent empty input still commits
    // a valid (metadata-only) archive instead of failing the job
    // sequential page build into a local staging file, then publish via
    // the destination's FileSystem (any scheme)
    val local = java.io.File.createTempFile("mbtiles-commit-", ".mbtiles")
    try {
      graft.engine.MbtilesArchive.drainWithStats(
        shards.iterator.flatMap(m => MbtilesShardCodec.readShard(m.path, conf.value)),
        local.getPath, metadata)
      val dst = new org.apache.hadoop.fs.Path(path)
      val fs = dst.getFileSystem(conf.value)
      fs.copyFromLocalFile(true, true, new org.apache.hadoop.fs.Path(local.getPath), dst)
    } finally {
      local.delete()
      deleteShardDir()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteShardDir()
}

/** Framed shard rows: tile_id, z, x, y, content_hash, len, bytes. */
private[sources] object MbtilesShardCodec {
  def readShard(path: String,
                conf: org.apache.hadoop.conf.Configuration): Iterator[graft.model.TileBytes] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(p.getFileSystem(conf).open(p), 1 << 20))
    new Iterator[graft.model.TileBytes] {
      private var nextRow: graft.model.TileBytes = advance()
      private def advance(): graft.model.TileBytes = {
        val id = try in.readLong() catch { case _: java.io.EOFException => in.close(); return null }
        val z = in.readInt(); val x = in.readInt(); val y = in.readInt()
        val hash = in.readLong()
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        graft.model.TileBytes(id, z, x, y, bytes, 0, hash)
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): graft.model.TileBytes = {
        val r = nextRow; nextRow = advance(); r
      }
    }
  }
}

private[sources] class MbtilesWriterFactory(shardDir: String, schema: StructType,
                                            conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new MbtilesDataWriter(shardDir, partitionId, taskId, schema, conf.value)
}

private[sources] class MbtilesDataWriter(shardDir: String, pid: Int, taskId: Long,
                                         schema: StructType,
                                         conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  private val idIdx = schema.fieldIndex("tile_id")
  private val zIdx = schema.fieldIndex("z")
  private val xIdx = schema.fieldIndex("x")
  private val yIdx = schema.fieldIndex("y")
  private val bytesIdx = schema.fieldIndex("bytes")
  private val hashIdx = schema.fieldIndex("content_hash")
  private var localFile: java.io.File = _
  private var out: java.io.DataOutputStream = _
  private var n = 0L
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      localFile = java.io.File.createTempFile(f"mbtiles-shard-$pid%05d-$taskId-", ".bin")
      out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(localFile), 1 << 20))
    }
    val id = row.getLong(idIdx)
    require(id > maxId || n == 0, s"shard input out of order: $id after $maxId")
    val bytes = row.getBinary(bytesIdx)
    out.writeLong(id)
    out.writeInt(row.getInt(zIdx)); out.writeInt(row.getInt(xIdx)); out.writeInt(row.getInt(yIdx))
    out.writeLong(row.getLong(hashIdx))
    out.writeInt(bytes.length)
    out.write(bytes)
    n += 1
    if (id < minId) minId = id
    if (id > maxId) maxId = id
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) return MbtilesShardMsg(pid, null, minId, maxId, 0L)
    out.close()
    val dst = new org.apache.hadoop.fs.Path(f"$shardDir/part-$pid%05d-$taskId.bin")
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    fs.copyFromLocalFile(true, true, new org.apache.hadoop.fs.Path(localFile.getPath), dst)
    MbtilesShardMsg(pid, dst.toString, minId, maxId, n)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (localFile != null) { localFile.delete(); () }
  }
  override def close(): Unit = ()
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
        val z = m("zoom_level").asInstanceOf[Long].toInt
        (z, m("tile_column").asInstanceOf[Long].toInt,
          (1 << z) - 1 - m("tile_row").asInstanceOf[Long].toInt, // TMS -> XYZ
          m("tile_data").asInstanceOf[Array[Byte]])
      }
    } else {
      // compact schema: this partition owns an `images` rowid range.
      // Pass 1 keeps only (tile_id -> rowid) — never the blobs (a
      // planet images table is tens of GB; an in-heap blob map would
      // OOM the task); pass 2 walks the narrow `map` table and
      // point-fetches each matching blob through the b-tree by rowid
      // (page-cached O(depth) seek). A map row's tile_id lives in
      // exactly one images partition, so the union is exact.
      lazy val images: scala.collection.Map[String, Long] = {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        db.rowsRange("images", lo, hi).foreach { case (rid, r) =>
          m += (r("tile_id").toString -> rid)
        }
        m
      }
      def blobAt(rid: Long): Array[Byte] =
        db.rowsRange("images", rid, rid).next()._2("tile_data").asInstanceOf[Array[Byte]]
      db.rows("map").flatMap { case (_, m) =>
        val z = m("zoom_level").asInstanceOf[Long].toInt
        val x = m("tile_column").asInstanceOf[Long].toInt
        val y = (1 << z) - 1 - m("tile_row").asInstanceOf[Long].toInt // TMS -> XYZ
        // pushed z/x/y filters gate the blob point-fetch: a filtered
        // scan never touches non-matching blob pages
        if (!pushed.forall(MbtilesScan.matches(_, z, x, y))) None
        else images.get(m("tile_id").toString).map(rid => (z, x, y, blobAt(rid)))
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
