package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.geo.Geo
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/**
 * GeoParquet source + sink (reference
 * `reader/parquet/GeoParquetMetadata.java:194` for the `geo` footer
 * key, `ParquetInputFile.java:86-100` for the covering-bbox row-group
 * filter, `GeoParquetReader` for hive-partition tags).
 *
 * Spark shape: the DATA path is Spark's own vectorized parquet scan
 * (column pruning, predicate pushdown, partition discovery all free);
 * this object adds the GEO layer on top —
 *
 *  - footer `geo` key parsing (version, primary_column, per-column
 *    encoding / geometry_types / crs / bbox / covering), with the
 *    reference's fallback sniff of binary `geometry` / `wkb_geometry` /
 *    `wkt_geometry` columns when the key is absent;
 *  - bounds pushdown: a lat/lon query box becomes range predicates on
 *    the covering bbox columns (declared covering, or the spec'd
 *    `bbox.xmin…` struct fallback) that reach the parquet scan as
 *    PushedFilters — the Spark analog of the reference's row-group
 *    FilterPredicate — plus the exact JTS envelope post-filter;
 *  - WKT/WKB decode to a uniform WKB `geometry` column;
 *  - hive-partition key=value path segments surface as columns via
 *    Spark's native partition discovery (the reference parses them
 *    into tags by hand, `GeoParquetReader`).
 *
 * The sink writes real GeoParquet: one file per partition through
 * parquet-hadoop with the `geo` footer attached and a covering `bbox`
 * struct column derived from each geometry, so round-trips prune.
 */
object GeoParquet {

  case class Covering(xmin: Seq[String], ymin: Seq[String], xmax: Seq[String], ymax: Seq[String])
  case class ColumnMeta(encoding: String, geometryTypes: Seq[String], crs: Option[String],
                        bbox: Option[Seq[Double]], covering: Option[Covering])
  case class Meta(version: String, primaryColumn: String, columns: Map[String, ColumnMeta]) {
    def primary: ColumnMeta = columns.getOrElse(primaryColumn,
      throw new IllegalArgumentException(s"no geoparquet metadata for primary column $primaryColumn"))
  }

  // ---------------- footer parsing ----------------

  /** Parse the `geo` footer JSON. */
  def parseGeoJson(json: String): Meta = {
    val root = new ObjectMapper().readTree(json)
    def strings(n: JsonNode): Seq[String] = (0 until n.size()).map(n.get(_).asText())
    val cols = Option(root.get("columns")).map { cs =>
      cs.properties().asScala.map { e =>
        val c = e.getValue
        val covering = Option(c.get("covering")).flatMap(cv => Option(cv.get("bbox"))).map { b =>
          Covering(strings(b.get("xmin")), strings(b.get("ymin")),
            strings(b.get("xmax")), strings(b.get("ymax")))
        }
        e.getKey -> ColumnMeta(
          encoding = Option(c.get("encoding")).map(_.asText()).getOrElse("WKB"),
          geometryTypes = Option(c.get("geometry_types")).map(strings).getOrElse(Nil),
          crs = Option(c.get("crs")).filterNot(_.isNull).map(_.toString),
          bbox = Option(c.get("bbox")).map(b => (0 until b.size()).map(b.get(_).asDouble())),
          covering = covering)
      }.toMap
    }.getOrElse(Map.empty)
    Meta(
      version = Option(root.get("version")).map(_.asText()).getOrElse("1.0.0"),
      primaryColumn = Option(root.get("primary_column")).map(_.asText())
        .getOrElse(cols.keys.headOption.getOrElse("geometry")),
      columns = cols)
  }

  /** Read the first parquet footer under `path`; parse `geo`, or fall
    * back to sniffing a binary geometry column (reference
    * `GeoParquetMetadata.parse`, `:203-221`). */
  def metadata(spark: SparkSession, path: String): Meta = {
    val conf = spark.sparkContext.hadoopConfiguration
    val file = firstParquetFile(path, conf)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val fm = reader.getFooter.getFileMetaData
      Option(fm.getKeyValueMetaData.get("geo")) match {
        case Some(json) => parseGeoJson(json)
        case None => fallbackMeta(fm.getSchema)
      }
    } finally reader.close()
  }

  private def fallbackMeta(schema: MessageType): Meta = {
    schema.getFields.asScala.collectFirst {
      case f if f.isPrimitive &&
        f.asPrimitiveType().getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.BINARY &&
        (f.getName == "geometry" || f.getName == "wkb_geometry") =>
        Meta("1.0.0", f.getName, Map(f.getName -> ColumnMeta("WKB", Nil, None, None, None)))
      case f if f.isPrimitive &&
        f.asPrimitiveType().getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.BINARY &&
        f.getName == "wkt_geometry" =>
        Meta("1.0.0", f.getName, Map(f.getName -> ColumnMeta("WKT", Nil, None, None, None)))
    }.getOrElse(throw new java.io.IOException(
      s"No valid geometry columns found: ${schema.getFields.asScala.map(_.getName).mkString(", ")}"))
  }

  private def firstParquetFile(path: String, conf: Configuration): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) p
    else {
      val it = fs.listFiles(p, true)
      var found: org.apache.hadoop.fs.Path = null
      while (found == null && it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          found = f.getPath
      }
      require(found != null, s"no parquet files under $path")
      found
    }
  }

  // ---------------- native expressions ----------------

  /** WKT string -> WKB bytes (one JTS parse per row). */
  case class WktToWkbExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(v: Any): Any = {
      // a WKT column stored as un-annotated BINARY arrives as bytes;
      // toString on Array[Byte] would be "[B@..." and null out every row
      val s = v match {
        case b: Array[Byte] => new String(b, "UTF-8")
        case other => other.toString
      }
      val g = Geo.fromWktOrNull(s)
      if (g == null) null else Geo.toWkb(g)
    }
    override protected def withNewChildInternal(c: Expression): WktToWkbExpr = copy(child = c)
  }

  /**
   * GeoArrow-encoded geometry -> WKB (reference decodes geoarrow via
   * `GeoParquetMetadata.getGeoArrowType` + GeoArrow column readers):
   * native nested columns `point` = struct<x,y>, `linestring` /
   * `multipoint` = array<struct>, `polygon` / `multilinestring` =
   * array<array<struct>>, `multipolygon` = array³<struct> — decoded in
   * one pass per row. GeoArrow's win at scale: coordinates are PLAIN
   * parquet doubles, so column stats prune on x/y directly and Spark
   * never materializes an opaque blob.
   */
  case class GeoArrowToWkbExpr(child: Expression, encoding: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    private def coord(r: org.apache.spark.sql.catalyst.InternalRow) =
      new org.locationtech.jts.geom.Coordinate(r.getDouble(0), r.getDouble(1))
    private def coords(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      Array.tabulate(a.numElements())(i => coord(a.getStruct(i, 2)))
    private def rings(a: org.apache.spark.sql.catalyst.util.ArrayData) =
      Seq.tabulate(a.numElements())(i => coords(a.getArray(i)))
    private def polygon(ringSeq: Seq[Array[org.locationtech.jts.geom.Coordinate]]) = {
      val gf = Geo.factory
      gf.createPolygon(gf.createLinearRing(ringSeq.head),
        ringSeq.tail.map(gf.createLinearRing).toArray)
    }
    override protected def nullSafeEval(v: Any): Any = {
      val gf = Geo.factory
      val g = encoding match {
        case e if e.endsWith("point") && !e.contains("multi") =>
          gf.createPoint(coord(v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
        case e if e.endsWith("multipoint") =>
          gf.createMultiPointFromCoords(coords(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))
        case e if e.endsWith("linestring") && !e.contains("multi") =>
          gf.createLineString(coords(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))
        case e if e.endsWith("multilinestring") =>
          gf.createMultiLineString(
            rings(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]).map(gf.createLineString).toArray)
        case e if e.endsWith("polygon") && !e.contains("multi") =>
          polygon(rings(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))
        case e if e.endsWith("multipolygon") =>
          val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          gf.createMultiPolygon(Seq.tabulate(a.numElements())(i =>
            polygon(rings(a.getArray(i)))).toArray)
        case other => throw new UnsupportedOperationException(s"geoarrow encoding $other")
      }
      Geo.toWkb(g)
    }
    override protected def withNewChildInternal(c: Expression): GeoArrowToWkbExpr = copy(child = c)
  }

  def geoarrow_to_wkb(c: Column, encoding: String): Column =
    SqlBridge.col(GeoArrowToWkbExpr(SqlBridge.expr(c), encoding))

  /** WKB geometry -> covering bbox struct<xmin,ymin,xmax,ymax>. */
  case class BboxStructExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BboxSchema
    override protected def nullSafeEval(v: Any): Any = {
      val env = Geo.fromWkb(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
      new GenericInternalRow(Array[Any](env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
    }
    override protected def withNewChildInternal(c: Expression): BboxStructExpr = copy(child = c)
  }

  /** Exact test: WKB geometry envelope intersects the query box. */
  case class EnvelopeIntersectsExpr(child: Expression,
                                    minX: Double, minY: Double, maxX: Double, maxY: Double)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(v: Any): Any = {
      val env = Geo.fromWkb(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
      env.getMinX <= maxX && env.getMaxX >= minX && env.getMinY <= maxY && env.getMaxY >= minY
    }
    override protected def withNewChildInternal(c: Expression): EnvelopeIntersectsExpr = copy(child = c)
  }

  val BboxSchema: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))

  def wkt_to_wkb(c: Column): Column = SqlBridge.col(WktToWkbExpr(SqlBridge.expr(c)))
  def bbox_struct(c: Column): Column = SqlBridge.col(BboxStructExpr(SqlBridge.expr(c)))

  // ---------------- read ----------------

  /** Lat/lon query box (minLon, minLat, maxLon, maxLat). */
  case class Bounds(minX: Double, minY: Double, maxX: Double, maxY: Double)

  private def pathCol(p: Seq[String]): Column =
    p.tail.foldLeft(col(p.head))(_.getField(_))

  /** The covering for pruning: declared metadata covering, else the
    * spec'd fallback `bbox.{xmin,ymin,xmax,ymax}` struct if present
    * (reference `ColumnMetadata.bboxFilter`, `:116-141`). */
  private def effectiveCovering(meta: Meta, schema: StructType): Option[Covering] =
    meta.primary.covering.orElse {
      schema.find(_.name == "bbox").map(_.dataType) match {
        case Some(s: StructType)
            if Seq("xmin", "ymin", "xmax", "ymax").forall(n =>
              s.exists(f => f.name == n && (f.dataType == DoubleType || f.dataType == FloatType))) =>
          Some(Covering(Seq("bbox", "xmin"), Seq("bbox", "ymin"), Seq("bbox", "xmax"), Seq("bbox", "ymax")))
        case _ => None
      }
    }

  /**
   * Read GeoParquet into a DataFrame with a decoded WKB `geometry`
   * column (WKT re-encoded; hive-partition columns surface natively).
   * With `bounds`, covering-bbox range predicates are applied FIRST —
   * they reach the parquet scan as PushedFilters and prune row groups
   * by column statistics — then the exact envelope-intersects test
   * runs on the decoded geometry.
   */
  def read(spark: SparkSession, path: String, bounds: Option[Bounds] = None): DataFrame =
    readWithMeta(spark, path, metadata(spark, path), bounds)

  /** As [[read]] with explicit metadata (e.g. for files produced by a
    * writer that could not attach the footer). */
  def readWithMeta(spark: SparkSession, path: String, meta: Meta,
                   bounds: Option[Bounds]): DataFrame = {
    val raw = spark.read.parquet(path)
    val gcol = meta.primaryColumn
    val enc = meta.primary.encoding
    val isGeoArrow = Seq("point", "linestring", "polygon")
      .exists(enc.toLowerCase.contains)
    val decoded = enc.toUpperCase match {
      case "WKB" =>
        if (gcol == "geometry") raw
        else raw.withColumn("geometry", col(gcol)).drop(gcol)
      case "WKT" =>
        // withColumn REPLACES a same-named column, so only drop the
        // source when it is not itself called "geometry"
        val d = raw.withColumn("geometry", wkt_to_wkb(col(gcol)))
        if (gcol == "geometry") d else d.drop(gcol)
      case _ if isGeoArrow =>
        // keep the native column alongside for pruning; decode to WKB
        val d = raw.withColumn("geometry", geoarrow_to_wkb(col(gcol), enc.toLowerCase))
        if (gcol == "geometry") d else d.drop(gcol)
      case other => throw new UnsupportedOperationException(s"geoparquet encoding $other")
    }
    bounds match {
      case None => decoded
      case Some(b) =>
        val pointEncoded = isGeoArrow && enc.toLowerCase.endsWith("point") &&
          !enc.toLowerCase.contains("multi")
        val pruned =
          if (pointEncoded)
            // geoarrow point: the x/y doubles ARE parquet columns —
            // range predicates prune on their stats directly, no bbox
            // covering column needed
            {
              val d = raw.where(
                col(gcol).getField("x") >= b.minX && col(gcol).getField("x") <= b.maxX &&
                  col(gcol).getField("y") >= b.minY && col(gcol).getField("y") <= b.maxY)
                .withColumn("geometry", geoarrow_to_wkb(col(gcol), enc.toLowerCase))
              if (gcol == "geometry") d else d.drop(gcol)
            }
          else effectiveCovering(meta, raw.schema) match {
            case Some(cov) =>
              decoded.where(
                pathCol(cov.xmax) >= b.minX && pathCol(cov.xmin) <= b.maxX &&
                  pathCol(cov.ymax) >= b.minY && pathCol(cov.ymin) <= b.maxY)
            case None => decoded
          }
        pruned.where(SqlBridge.col(EnvelopeIntersectsExpr(
          SqlBridge.expr(col("geometry")), b.minX, b.minY, b.maxX, b.maxY)))
    }
  }

  // ---------------- write ----------------

  private def parquetType(name: String, dt: DataType): org.apache.parquet.schema.Type = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import PrimitiveType.PrimitiveTypeName._
    dt match {
      case IntegerType => Types.optional(INT32).named(name)
      case LongType => Types.optional(INT64).named(name)
      case FloatType => Types.optional(FLOAT).named(name)
      case DoubleType => Types.optional(DOUBLE).named(name)
      case BooleanType => Types.optional(BOOLEAN).named(name)
      case StringType =>
        Types.optional(BINARY).as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType => Types.optional(BINARY).named(name)
      case s: StructType =>
        s.fields.foldLeft(Types.optionalGroup())((g, f) => g.addField(parquetType(f.name, f.dataType)))
          .named(name)
      case other => throw new UnsupportedOperationException(s"geoparquet write: $other")
    }
  }

  private[sources] def messageType(schema: StructType): MessageType = {
    import org.apache.parquet.schema.Types
    val b0: Types.GroupBuilder[MessageType] = Types.buildMessage()
    schema.fields.foldLeft(b0)((m, f) => m.addField(parquetType(f.name, f.dataType)))
      .named("spark_schema")
  }

  // ---- RecordConsumer-based row writer (no Group objects): field
  // writers are compiled once per schema into index-addressed lambdas,
  // so the per-row cost is direct addX calls — ~an order of magnitude
  // less allocation + no by-name field lookup per value, same bytes ----

  private type FieldWriter =
    (org.apache.parquet.io.api.RecordConsumer, org.apache.spark.sql.Row) => Unit
  private type ValueWriter = (org.apache.parquet.io.api.RecordConsumer, Any) => Unit

  private def valueWriter(dt: DataType): ValueWriter = dt match {
    case IntegerType => (rc, v) => rc.addInteger(v.asInstanceOf[Int])
    case LongType => (rc, v) => rc.addLong(v.asInstanceOf[Long])
    case FloatType => (rc, v) => rc.addFloat(v.asInstanceOf[Float])
    case DoubleType => (rc, v) => rc.addDouble(v.asInstanceOf[Double])
    case BooleanType => (rc, v) => rc.addBoolean(v.asInstanceOf[Boolean])
    case StringType => (rc, v) =>
      rc.addBinary(org.apache.parquet.io.api.Binary.fromString(v.asInstanceOf[String]))
    case BinaryType => (rc, v) =>
      rc.addBinary(org.apache.parquet.io.api.Binary.fromConstantByteArray(v.asInstanceOf[Array[Byte]]))
    case s: StructType =>
      val ws = fieldWriters(s)
      (rc, v) => {
        rc.startGroup()
        val row = v.asInstanceOf[org.apache.spark.sql.Row]
        var i = 0
        while (i < ws.length) { ws(i)(rc, row); i += 1 }
        rc.endGroup()
      }
    case other => throw new UnsupportedOperationException(s"geoparquet write: $other")
  }

  private def fieldWriters(s: StructType): Array[FieldWriter] =
    s.fields.zipWithIndex.map { case (f, i) =>
      val name = f.name
      val w = valueWriter(f.dataType)
      val fw: FieldWriter = (rc, row) =>
        if (!row.isNullAt(i)) {
          rc.startField(name, i)
          w(rc, row.get(i))
          rc.endField(name, i)
        }
      fw
    }

  private class RowWriteSupport(schema: StructType, mt: MessageType,
                                meta: java.util.Map[String, String])
      extends org.apache.parquet.hadoop.api.WriteSupport[org.apache.spark.sql.Row] {
    private val writers = fieldWriters(schema)
    private var rc: org.apache.parquet.io.api.RecordConsumer = _
    override def init(c: org.apache.hadoop.conf.Configuration) =
      new org.apache.parquet.hadoop.api.WriteSupport.WriteContext(mt, meta)
    override def prepareForWrite(r: org.apache.parquet.io.api.RecordConsumer): Unit = rc = r
    override def write(row: org.apache.spark.sql.Row): Unit = {
      rc.startMessage()
      var i = 0
      while (i < writers.length) { writers(i)(rc, row); i += 1 }
      rc.endMessage()
    }
  }

  private class RowParquetWriterBuilder(path: org.apache.hadoop.fs.Path,
                                        support: RowWriteSupport)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[
        org.apache.spark.sql.Row, RowParquetWriterBuilder](path) {
    override def self(): RowParquetWriterBuilder = this
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration): RowWriteSupport =
      support
  }

  /** The `geo` footer JSON: WKB columns carry a bbox-struct covering;
    * geoarrow columns prune on their own coordinate stats. */
  private[sources] def geoJson(geomCol: String, geometryTypes: Seq[String],
                               encoding: String = "WKB"): String = {
    val types = geometryTypes.map(t => "\"" + t + "\"").mkString("[", ",", "]")
    val covering =
      if (encoding == "WKB")
        ""","covering":{"bbox":{"xmin":["bbox","xmin"],"ymin":["bbox","ymin"],"xmax":["bbox","xmax"],"ymax":["bbox","ymax"]}}"""
      else ""
    s"""{"version":"1.1.0","primary_column":"$geomCol","columns":{"$geomCol":{""" +
      s""""encoding":"$encoding","geometry_types":$types$covering}}}"""
  }

  /**
   * Write `df` as GeoParquet under `dir`: one file per non-empty
   * partition (distributed, no driver collect), `geo` footer attached,
   * and a covering `bbox` struct derived from `geomCol` (WKB) if not
   * already present — so a downstream [[read]] with bounds prunes.
   */
  def write(df: DataFrame, dir: String, geomCol: String = "geometry",
            geometryTypes: Seq[String] = Nil, encoding: String = "WKB"): Unit = {
    val bboxShapeOk = df.schema.find(_.name == "bbox").forall(_.dataType match {
      case s: StructType =>
        Seq("xmin", "ymin", "xmax", "ymax").forall(n =>
          s.exists(f => f.name == n && (f.dataType == DoubleType || f.dataType == FloatType)))
      case _ => false
    })
    val withBbox = encoding match {
      case "WKB" =>
        require(df.schema(geomCol).dataType == BinaryType, s"$geomCol must be WKB binary")
        if (df.schema.exists(_.name == "bbox")) {
          // a pre-existing bbox column becomes the DECLARED covering —
          // reads prune on it, so a mis-shaped one must fail here, not
          // silently break every bounded read downstream
          require(bboxShapeOk,
            "existing 'bbox' column is not a struct<xmin,ymin,xmax,ymax:double> — " +
              "rename it or drop it so the writer can derive the covering")
          df
        } else df.withColumn("bbox", bbox_struct(col(geomCol)))
      case "point" =>
        // geoarrow point: struct<x,y> doubles — their own column stats
        // are the covering, no bbox column needed
        require(df.schema(geomCol).dataType.isInstanceOf[StructType],
          s"$geomCol must be struct<x,y> for geoarrow point encoding")
        df
      case other => throw new UnsupportedOperationException(s"write encoding $other")
    }
    val schema = withBbox.schema
    val mt = messageType(schema)
    val mtString = mt.toString
    val json = geoJson(geomCol, geometryTypes, encoding)
    val conf = new SerializableConfiguration(df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val baseFs = base.getFileSystem(conf.value)
    baseFs.mkdirs(base)
    // overwrite semantics: stale part files from a previous wider write
    // must not survive and mix into the next read
    baseFs.globStatus(new org.apache.hadoop.fs.Path(base, "part-*.parquet"))
      .foreach(st => baseFs.delete(st.getPath, false))
    withBbox.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val mtLocal = org.apache.parquet.schema.MessageTypeParser.parseMessageType(mtString)
        val fs = base.getFileSystem(conf.value)
        // write to an ATTEMPT-unique temp name, then rename into place:
        // retries and speculative attempts each produce a complete
        // private file (no two writers ever share a path), and readers
        // only ever see whole files — a deterministic shared filename
        // in OVERWRITE mode would let concurrent attempts interleave
        val tmp = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.parquet.tmp")
        val out = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.parquet")
        val support = new RowWriteSupport(schema, mtLocal, Map("geo" -> json).asJava)
        val writer = new RowParquetWriterBuilder(tmp, support)
          .withConf(conf.value)
          .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
          .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
          .build()
        try rows.foreach(writer.write) finally writer.close()
        fs.delete(out, false) // a losing earlier attempt's complete file
        require(fs.rename(tmp, out), s"rename $tmp -> $out failed")
      }
    }
  }
}
