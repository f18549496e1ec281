package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * DataSource V2 provider for OSM PBF files —
 * `spark.read.format("osmpbf").load(path)` over the from-scratch
 * [[OsmPbf]] codec.
 *
 * Scale shape: the PBF format is a sequence of independently
 * decodable zlib blobs (~8k entities each), so the driver indexes
 * blob offsets with a cheap header-only scan and plans one
 * `InputPartition` per contiguous byte-balanced blob range — a planet
 * file (~70k blobs / 70 GB) decodes with full cluster parallelism,
 * the same block-parallel design as the reference's
 * `reader/osm/OsmInputFile.java` worker pool, expressed as a Spark
 * scan.
 *
 * Pushdown: `kind` equality/IN filters reach the decoder, which skips
 * non-matching primitive groups before their packed arrays are
 * parsed (a ways-only pass over a planet file never delta-decodes the
 * ~8×10⁹ dense-node arrays).
 */
class OsmPbfDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "osmpbf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OsmPbfDataSource.Schema
  // writes arrive with the DataFrame's own (osmpbf-shaped) schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OsmPbfTable(MbtilesDataSource.pathsOf(new CaseInsensitiveStringMap(properties)))
}

object OsmPbfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("refs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("member_types", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("member_ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("member_roles", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("changeset", LongType, nullable = false),
    StructField("uid", IntegerType, nullable = false),
    StructField("user", StringType, nullable = false),
    // LocationsOnWays: per-ref coordinates on the way itself (empty
    // when the file is not location-padded)
    StructField("ref_lats", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ref_lons", ArrayType(DoubleType, containsNull = false), nullable = false)))
}

private[sources] class OsmPbfTable(paths: Seq[String]) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"osmpbf(${paths.mkString(",")})"
  override def schema(): StructType = OsmPbfDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(paths, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new OsmPbfWriteBuilder(paths.head, info)
}

/**
 * DSv2 WRITE: `entities.write.format("osmpbf").save(path)`.
 *
 * PBF data blobs are self-contained (each carries its own string
 * table and delta baselines), so parallelism is free: every task
 * streams its partition as framed OSMData blobs into a shard via the
 * Hadoop FileSystem, and commit writes `OSMHeader` + a byte-level
 * concatenation of the shards in partition order — no re-encode, no
 * driver-side row work. `.option("bbox", "left,bottom,right,top")`
 * populates the header bbox.
 */
private[sources] class OsmPbfWriteBuilder(
    path: String, info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  import org.apache.spark.sql.connector.write._
  override def truncate(): WriteBuilder = this
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val bbox = Option(info.options().get("bbox")).map { s =>
        val a = s.split(",").map(_.trim.toDouble)
        require(a.length == 4, "bbox must be left,bottom,right,top")
        (a(0), a(1), a(2), a(3))
      }
      new OsmPbfBatchWrite(path, info.schema(), bbox)
    }
  }
}

private[sources] case class OsmPbfShardMsg(pid: Int, path: String, entities: Long,
                                           hasWayLocations: Boolean = false)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class OsmPbfBatchWrite(path: String, schema: StructType,
                                        bbox: Option[(Double, Double, Double, Double)])
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private val shardDir = path + ".shards"
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  // the executor-side writer reads every schema field positionally and
  // by type — demand presence AND matching types up front with one
  // clear driver-side error instead of a deep-in-the-job
  // ClassCastException (a null array would NPE the same way: null
  // arrays/maps arrive as empty through the nullable=false schema)
  OsmPbfDataSource.Schema.fields.foreach { f =>
    val i = schema.fieldNames.indexOf(f.name)
    require(i >= 0, s"osmpbf write needs column '${f.name}' " +
      s"(full osmpbf schema: ${OsmPbfDataSource.Schema.fieldNames.mkString(", ")})")
    require(DataType.equalsIgnoreNullability(schema.fields(i).dataType, f.dataType),
      s"osmpbf write column '${f.name}' must be ${f.dataType.simpleString}, " +
        s"got ${schema.fields(i).dataType.simpleString}")
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new OsmPbfWriterFactory(shardDir, schema, conf)

  private def deleteShardDir(): Unit = {
    val p = new org.apache.hadoop.fs.Path(shardDir)
    p.getFileSystem(conf.value).delete(p, true)
    ()
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case m: OsmPbfShardMsg if m.entities > 0 => m }.sortBy(_.pid)
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf.value)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(dst, true), 1 << 20))
    try {
      OsmPbf.writeHeaderFrame(out, bbox,
        locationsOnWays = shards.exists(_.hasWayLocations))
      val buf = new Array[Byte](1 << 20)
      shards.foreach { m =>
        val sp = new org.apache.hadoop.fs.Path(m.path)
        val in = sp.getFileSystem(conf.value).open(sp)
        try {
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    } finally {
      out.close()
      deleteShardDir()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteShardDir()
}

private[sources] class OsmPbfWriterFactory(shardDir: String, schema: StructType,
                                           conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new OsmPbfDataWriter(shardDir, partitionId, taskId, schema, conf.value)
}

private[sources] class OsmPbfDataWriter(shardDir: String, pid: Int, taskId: Long,
                                        schema: StructType,
                                        conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage
  private val idx = OsmPbfDataSource.Schema.fieldNames.map(n => n -> schema.fieldIndex(n)).toMap
  private var localFile: java.io.File = _
  private var out: java.io.DataOutputStream = _
  private var bw: OsmPbf.BlockWriter = _
  private var n = 0L
  private var hasWayLocations = false

  // null arrays/maps/strings from a permissive upstream schema are
  // treated as empty instead of NPEing deep in the job
  private def strArray(row: InternalRow, field: String): Array[String] = {
    if (row.isNullAt(idx(field))) return Array.empty
    val a = row.getArray(idx(field))
    (0 until a.numElements()).map(a.getUTF8String(_).toString).toArray
  }
  private def longArray(row: InternalRow, field: String): Array[Long] =
    if (row.isNullAt(idx(field))) Array.empty else row.getArray(idx(field)).toLongArray()
  private def doubleArray(row: InternalRow, field: String): Array[Double] =
    if (row.isNullAt(idx(field))) Array.empty else row.getArray(idx(field)).toDoubleArray()

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      localFile = java.io.File.createTempFile(f"osmpbf-shard-$pid%05d-$taskId-", ".bin")
      out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(localFile), 1 << 20))
      bw = new OsmPbf.BlockWriter(out)
    }
    val tags =
      if (row.isNullAt(idx("tags"))) Seq.empty[(String, String)]
      else {
        val tagsData = row.getMap(idx("tags"))
        (0 until tagsData.numElements()).map { i =>
          tagsData.keyArray().getUTF8String(i).toString ->
            tagsData.valueArray().getUTF8String(i).toString
        }
      }
    val refLats = doubleArray(row, "ref_lats")
    bw.add(OsmPbf.Entity(
      row.getUTF8String(idx("kind")).toString,
      row.getLong(idx("id")),
      if (row.isNullAt(idx("lat"))) Double.NaN else row.getDouble(idx("lat")),
      if (row.isNullAt(idx("lon"))) Double.NaN else row.getDouble(idx("lon")),
      tags,
      longArray(row, "refs"),
      strArray(row, "member_types"),
      longArray(row, "member_ids"),
      strArray(row, "member_roles"),
      row.getInt(idx("version")),
      row.getLong(idx("timestamp")),
      row.getLong(idx("changeset")),
      row.getInt(idx("uid")),
      if (row.isNullAt(idx("user"))) "" else row.getUTF8String(idx("user")).toString,
      refLats = refLats,
      refLons = doubleArray(row, "ref_lons")))
    if (refLats.length > 0) hasWayLocations = true
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) return OsmPbfShardMsg(pid, null, 0L)
    bw.flush()
    out.close()
    val dst = new org.apache.hadoop.fs.Path(f"$shardDir/part-$pid%05d-$taskId.bin")
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    fs.copyFromLocalFile(true, true, new org.apache.hadoop.fs.Path(localFile.getPath), dst)
    OsmPbfShardMsg(pid, dst.toString, n, hasWayLocations)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    if (localFile != null) { localFile.delete(); () }
  }
  override def close(): Unit = ()
}

private[sources] class OsmPbfScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("kind", _: String) => true
      case In("kind", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accepted
    rejected // kind filters are group-level skips, not exact row filters per se,
    // but they ARE exact here (every emitted row matches), so Spark may
    // still re-check; returning them rejected=false keeps plans simple.
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val target = Option(options.get("maxpartitions")).map(_.toInt)
      .getOrElse(org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism)
    // INTERSECT the accepted filters (they are conjuncts): two
    // surviving IN filters must narrow, not widen
    val sets: Seq[Set[String]] = pushed.toSeq.collect {
      case EqualTo("kind", v: String) => Set(v)
      case In("kind", vs) => vs.map(_.toString).toSet
    }
    val kinds: Set[String] = sets.reduceOption(_ intersect _) match {
      case None => Set.empty // no kind filter: all kinds
      case Some(s) if s.nonEmpty => s
      case Some(_) => Set("__none__") // contradictory conjuncts: match nothing
    }
    new OsmPbfScan(paths, kinds, math.max(target, 1))
  }
}

private[sources] case class OsmPbfInputPartition(
    path: String, offsets: Array[Long], sizes: Array[Int]) extends InputPartition

private[sources] class OsmPbfScan(paths: Seq[String], kinds: Set[String], target: Int)
    extends Scan with Batch {
  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /** Contiguous blob ranges balanced by compressed bytes. Blobs whose
    * indexdata kind hint contradicts the pushed kind filter are
    * dropped at PLANNING time — never fetched, never inflated. The
    * spec leaves indexdata undefined, so hints are honored ONLY for
    * graft-written files (header writingProgram): a foreign producer's
    * opaque indexdata happening to spell "node" must not prune rows. */
  private lazy val partitions: Array[InputPartition] = {
    val all = paths.flatMap { p =>
      // index ONCE per file: the header blob comes out of the same
      // frame walk the data refs do (readHeader would re-scan all ~70k
      // frame headers of a planet file a second time)
      val refs = OsmPbf.indexBlobs(p, conf.value)
      val trusted = refs.find(_.isHeader).exists { h =>
        OsmPbf.decodeHeader(OsmPbf.inflateBlob(
          OsmPbf.readBlobBytes(h, conf.value))).writingProgram == "graft"
      }
      if (trusted) refs else refs.map(_.copy(kindHint = ""))
    }.filterNot(_.isHeader)
    val refs =
      if (kinds.isEmpty) all
      else all.filter(r => r.kindHint.isEmpty || kinds(r.kindHint))
    prunedBlobs = all.length - refs.length
    if (refs.isEmpty) Array.empty
    else {
      val totalBytes = refs.map(_.size.toLong).sum
      val perPart = math.max(1L, totalBytes / target)
      val out = Array.newBuilder[InputPartition]
      var cur = List.empty[OsmPbf.BlobRef]
      var curBytes = 0L
      def flush(): Unit = if (cur.nonEmpty) {
        val rs = cur.reverse
        out += OsmPbfInputPartition(rs.head.path, rs.map(_.offset).toArray, rs.map(_.size).toArray)
        cur = Nil; curBytes = 0L
      }
      refs.foreach { r =>
        if (cur.nonEmpty && (cur.head.path != r.path || curBytes >= perPart)) flush()
        cur = r :: cur
        curBytes += r.size
      }
      flush()
      out.result()
    }
  }

  private var prunedBlobs: Int = 0
  override def readSchema(): StructType = OsmPbfDataSource.Schema
  override def toBatch: Batch = this
  override def description(): String = {
    val p = partitions // force planning so prunedBlobs is final
    s"osmpbf scan, blobRangePartitions=${p.length}, " +
      s"pushedKinds=[${kinds.toSeq.sorted.mkString(",")}], prunedBlobs=$prunedBlobs"
  }
  override def planInputPartitions(): Array[InputPartition] = partitions
  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfReaderFactory(conf, kinds)
}

private[sources] class OsmPbfReaderFactory(conf: SerializableConfiguration, kinds: Set[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmPbfInputPartition]
    new OsmPbfPartitionReader(p, conf.value, kinds)
  }
}

private[sources] class OsmPbfPartitionReader(
    part: OsmPbfInputPartition, conf: org.apache.hadoop.conf.Configuration, kinds: Set[String])
    extends PartitionReader[InternalRow] {
  private val fsPath = new org.apache.hadoop.fs.Path(part.path)
  private val in = fsPath.getFileSystem(conf).open(fsPath)

  private val iter: Iterator[OsmPbf.Entity] =
    part.offsets.indices.iterator.flatMap { i =>
      val b = new Array[Byte](part.sizes(i))
      in.seek(part.offsets(i))
      in.readFully(b)
      OsmPbf.decodeBlobEntities(b, kinds)
    }

  private var cur: OsmPbf.Entity = _
  override def next(): Boolean =
    if (iter.hasNext) { cur = iter.next(); true } else false

  private def utf8Array(a: Array[String]): GenericArrayData =
    new GenericArrayData(a.map(s => UTF8String.fromString(s): Any))

  override def get(): InternalRow = {
    val e = cur
    val tags = new ArrayBasedMapData(
      new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._1): Any).toArray),
      new GenericArrayData(e.tags.map(t => UTF8String.fromString(t._2): Any).toArray))
    InternalRow(
      UTF8String.fromString(e.kind), e.id,
      if (e.lat.isNaN) null else e.lat,
      if (e.lon.isNaN) null else e.lon,
      tags,
      new GenericArrayData(e.refs),
      utf8Array(e.memberTypes),
      new GenericArrayData(e.memberIds),
      utf8Array(e.memberRoles),
      e.version, e.timestamp, e.changeset, e.uid, UTF8String.fromString(e.user),
      new GenericArrayData(e.refLats), new GenericArrayData(e.refLons))
  }

  override def close(): Unit = in.close()
}
