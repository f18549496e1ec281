package graft.sources

import graft.geo.{Geo, RingAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.locationtech.jts.geom._
import scala.collection.mutable.ArrayBuffer

/**
 * ESRI Shapefile reader (reference: `reader/ShapefileReader.java:44`,
 * which delegates to GeoTools; this is a from-scratch parser of the
 * PUBLIC shapefile spec — .shp geometry records + .dbf attributes —
 * since the sandbox ships no GeoTools).
 *
 * Supported shapes: Null(0), Point(1), PolyLine(3), Polygon(5),
 * MultiPoint(8) and their Z/M variants (Z/M ordinates skipped).
 * Polygon rings nest by containment (outermost shells, odd-depth
 * holes) via [[RingAssembler.polygonize]].
 *
 * CRS: the sidecar `.prj` is parsed per file ([[graft.geo.Crs]],
 * mirroring the reference's reproject-to-WGS84 at read time,
 * `ShapefileReader.java:132`): WGS84 passes through, EPSG:3857 web
 * mercator is reprojected closed-form, anything else fails loudly —
 * a national-grid shapefile must never silently emit garbage lon/lat.
 * A missing `.prj` is treated as WGS84 (the historical behavior).
 *
 * Spark shape: one task per .shp file (the format caps a file at 2 GB,
 * so per-file parallelism is the natural split — real datasets arrive
 * as many shapefiles); bytes stream through the Hadoop FileSystem API
 * so any scheme (file://, hdfs://, s3a://) works.
 */
object Shapefile {

  case class ShpRow(path: String, record: Int, geom: Array[Byte], attrs: Map[String, String])
  case class DbfField(name: String, typ: Char, length: Int)

  /** Read one shapefile (or every .shp under a directory) into
    * (path, record, geom WKB, attrs). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val shpPaths = listShp(spark, path)
    require(shpPaths.nonEmpty, s"no .shp files under $path")
    spark.createDataset(shpPaths)
      .repartition(math.min(shpPaths.length, 64))
      .flatMap(shp => readOne(shp, conf.value))
      .toDF()
  }

  /** Per-file parse, shared by [[read]] and the DSv2 provider. */
  private[sources] def readOne(shp: String,
                               conf: org.apache.hadoop.conf.Configuration): Seq[ShpRow] = {
    val fs = new org.apache.hadoop.fs.Path(shp).getFileSystem(conf)
    def slurp(p: String): Array[Byte] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(hp)) Array.emptyByteArray
      else {
        val in = fs.open(hp)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
      }
    }
    val geoms = parseShp(slurp(shp))
    val base = shp.stripSuffix(".shp")
    val (fields, records) = parseDbf(slurp(base + ".dbf"))
    val srs = graft.geo.Crs.parseWkt(new String(slurp(base + ".prj"), "UTF-8"))
    geoms.zipWithIndex.map { case ((recNo, g), i) =>
      val attrs: Map[String, String] =
        if (i < records.length && records(i) != null)
          fields.map(_.name).zip(records(i)).filter(_._2.nonEmpty).toMap
        else Map.empty // past-the-end or deleted dbf row
      ShpRow(shp, recNo,
        if (g == null) Array.emptyByteArray
        else Geo.toWkb(graft.geo.Crs.toWgs84(g, srs)), attrs)
    }
  }

  private def listShp(spark: SparkSession, path: String): Seq[String] =
    VectorFileDataSource.listBySuffix(path, ".shp",
      spark.sparkContext.hadoopConfiguration)

  // ---------------- .shp geometry records ----------------

  /** Parse the .shp main file: Seq of (recordNumber, geometry|null). */
  def parseShp(bytes: Array[Byte]): Seq[(Int, Geometry)] = {
    require(bytes.length >= 100, "shp too short")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.order(java.nio.ByteOrder.BIG_ENDIAN).getInt(0) == 9994, "bad .shp file code")
    val fileLenBytes = bb.getInt(24).toLong * 2
    val out = ArrayBuffer.empty[(Int, Geometry)]
    var pos = 100
    while (pos + 8 <= math.min(fileLenBytes, bytes.length)) {
      bb.order(java.nio.ByteOrder.BIG_ENDIAN)
      val recNo = bb.getInt(pos)
      val contentLen = bb.getInt(pos + 4) * 2
      val start = pos + 8
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val shapeType = bb.getInt(start)
      out += ((recNo, parseShape(bb, start, shapeType)))
      pos = start + contentLen
    }
    out.toSeq
  }

  private def parseShape(bb: java.nio.ByteBuffer, start: Int, shapeType: Int): Geometry = {
    val gf = Geo.factory
    def d(off: Int) = bb.getDouble(start + off)
    def i(off: Int) = bb.getInt(start + off)
    shapeType match {
      case 0 => null // null shape
      case 1 | 11 | 21 => // Point / PointZ / PointM
        gf.createPoint(new Coordinate(d(4), d(12)))
      case 8 | 18 | 28 => // MultiPoint (+Z/M)
        val n = i(36)
        val pts = Array.tabulate(n)(k => new Coordinate(d(40 + 16 * k), d(48 + 16 * k)))
        if (n == 1) gf.createPoint(pts(0)) else gf.createMultiPointFromCoords(pts)
      case 3 | 13 | 23 | 5 | 15 | 25 => // PolyLine / Polygon (+Z/M)
        val numParts = i(36)
        val numPoints = i(40)
        val partsOff = 44
        val pointsOff = partsOff + 4 * numParts
        val parts = Array.tabulate(numParts)(k => i(partsOff + 4 * k))
        def part(k: Int): Array[Coordinate] = {
          val from = parts(k)
          val until = if (k + 1 < numParts) parts(k + 1) else numPoints
          Array.tabulate(until - from)(j =>
            new Coordinate(d(pointsOff + 16 * (from + j)), d(pointsOff + 16 * (from + j) + 8)))
        }
        val rings = (0 until numParts).map(part)
        if (shapeType % 10 == 3) { // polyline family
          val lines = rings.filter(_.length >= 2).map(gf.createLineString)
          if (lines.length == 1) lines.head else gf.createMultiLineString(lines.toArray)
        } else { // polygon family: nest rings by containment
          RingAssembler.polygonize(rings.filter(_.length >= 4), gf)
        }
      case other => throw new IllegalArgumentException(s"unsupported shape type $other")
    }
  }

  // ---------------- .dbf attribute records ----------------

  /** Parse a dBase III .dbf: (fields, records as trimmed strings). */
  def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[Array[String]]) = {
    if (bytes.length < 32) return (Seq.empty, Seq.empty)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val numRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recordSize = bb.getShort(10) & 0xffff
    val fields = ArrayBuffer.empty[DbfField]
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
      val name = new String(bytes, off, nameEnd - off, "ISO-8859-1")
      fields += DbfField(name, bytes(off + 11).toChar, bytes(off + 16) & 0xff)
      off += 32
    }
    val records = ArrayBuffer.empty[Array[String]]
    var pos = headerSize
    var r = 0
    while (r < numRecords && pos + recordSize <= bytes.length) {
      if (bytes(pos) != 0x2a) {
        val vals = new Array[String](fields.length)
        var fo = pos + 1
        fields.indices.foreach { fi =>
          val f = fields(fi)
          vals(fi) = new String(bytes, fo, f.length, "ISO-8859-1").trim
          fo += f.length
        }
        records += vals
      } else {
        // deleted (0x2A) rows stay as a null PLACEHOLDER: .shp/.dbf
        // records pair positionally, so dropping the row would shift
        // every later geometry onto the wrong attributes
        records += null
      }
      pos += recordSize
      r += 1
    }
    (fields.toSeq, records.toSeq)
  }

  // -------------------------------------------------------------------------
  // writer (point / polyline / polygon shapefiles — fixtures + export sink)
  // -------------------------------------------------------------------------

  /** dBase III attribute file for `rows` of C-typed values. */
  private def dbfBytes(rows: Seq[Seq[String]], fields: Seq[(String, Int)]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_._2).sum
    val dbf = ByteBuffer.allocate(headerSize + rows.length * recordSize + 1)
    dbf.order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, rows.length)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, len), fi) =>
      val base = 32 + 32 * fi
      val nb = name.getBytes("ISO-8859-1").take(10)
      nb.indices.foreach(k => dbf.put(base + k, nb(k)))
      dbf.put(base + 11, 'C'.toByte)
      dbf.put(base + 16, len.toByte)
    }
    dbf.put(headerSize - 1, 0x0d.toByte)
    var rp = headerSize
    rows.foreach { vals =>
      dbf.put(rp, 0x20.toByte)
      var fo = rp + 1
      fields.zipWithIndex.foreach { case ((_, len), fi) =>
        val v = (if (fi < vals.length) vals(fi) else "").getBytes("ISO-8859-1")
        var k = 0
        while (k < len) { dbf.put(fo + k, if (k < v.length) v(k) else ' '.toByte); k += 1 }
        fo += len
      }
      rp += recordSize
    }
    dbf.put(dbf.capacity() - 1, 0x1a.toByte)
    dbf.array()
  }

  private def save(basePath: String, suffix: String, bytes: Array[Byte],
                   conf: org.apache.hadoop.conf.Configuration): Unit = {
    val hp = new org.apache.hadoop.fs.Path(basePath + suffix)
    val outS = hp.getFileSystem(conf).create(hp, true)
    try outS.write(bytes) finally outS.close()
  }

  /**
   * Write a point shapefile (`.shp` + `.dbf`, WGS84 — no `.prj`
   * needed under the historical default): the inverse of the reader
   * for shape type 1 with C-typed attributes. `fields` fixes the
   * column order; every value is space-padded to its field length.
   */
  def writePoints(basePath: String,
                  rows: Seq[(Double, Double, Seq[String])],
                  fields: Seq[(String, Int)],
                  conf: org.apache.hadoop.conf.Configuration): Unit = {
    import java.nio.{ByteBuffer, ByteOrder}
    val recBytes = 8 + 4 + 16 // record header + shape type + x,y
    val shpLen = 100 + rows.length * recBytes
    val shp = ByteBuffer.allocate(shpLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, shpLen / 2) // length in 16-bit words
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000) // version
    shp.putInt(32, 1)    // point
    val (xs, ys) = (rows.map(_._1), rows.map(_._2))
    if (rows.nonEmpty) {
      shp.putDouble(36, xs.min); shp.putDouble(44, ys.min)
      shp.putDouble(52, xs.max); shp.putDouble(60, ys.max)
    }
    var off = 100
    rows.zipWithIndex.foreach { case ((x, y, _), i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)       // 1-based record number
      shp.putInt(off + 4, 10)      // content words: 4 + 16 bytes
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(off + 8, 1)
      shp.putDouble(off + 12, x)
      shp.putDouble(off + 20, y)
      off += recBytes
    }
    save(basePath, ".shp", shp.array(), conf)
    save(basePath, ".dbf", dbfBytes(rows.map(_._3), fields), conf)
  }

  /**
   * Write a polyline (shape type 3) or polygon (type 5) shapefile from
   * JTS geometries — the line/polygon inverse of [[parseShape]].
   * Lines decompose into one part per LineString; polygons into one
   * part per ring, shells CW and holes CCW per the ESRI spec (the
   * reader re-nests by containment, so orientation is advisory but
   * kept spec-true for foreign readers). Geometries of the wrong
   * family are rejected loudly.
   */
  def writeGeoms(basePath: String, shapeType: Int,
                 rows: Seq[(Geometry, Seq[String])],
                 fields: Seq[(String, Int)],
                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    import java.nio.{ByteBuffer, ByteOrder}
    import org.locationtech.jts.geom.{LineString, MultiLineString, Polygon => JPolygon, MultiPolygon}
    require(shapeType == 3 || shapeType == 5, s"writeGeoms supports 3/5, got $shapeType")
    def partsOf(g: Geometry): Seq[Array[Coordinate]] = (shapeType, g) match {
      case (3, l: LineString) => Seq(l.getCoordinates)
      case (3, ml: MultiLineString) =>
        (0 until ml.getNumGeometries).map(ml.getGeometryN(_).getCoordinates)
      case (5, p: JPolygon) => ringsOf(p)
      case (5, mp: MultiPolygon) =>
        (0 until mp.getNumGeometries).flatMap(k =>
          ringsOf(mp.getGeometryN(k).asInstanceOf[JPolygon]))
      case _ => throw new IllegalArgumentException(
        s"shape type $shapeType cannot encode ${g.getGeometryType}")
    }
    def ringsOf(p: JPolygon): Seq[Array[Coordinate]] = {
      // ESRI: shells clockwise, holes counter-clockwise (screen-y-down
      // CW == math CCW area test)
      def oriented(cs: Array[Coordinate], clockwise: Boolean): Array[Coordinate] = {
        val ccw = org.locationtech.jts.algorithm.Orientation.isCCW(cs)
        if (ccw == clockwise) cs.reverse else cs
      }
      oriented(p.getExteriorRing.getCoordinates, clockwise = true) +:
        (0 until p.getNumInteriorRing).map(k =>
          oriented(p.getInteriorRingN(k).getCoordinates, clockwise = false))
    }
    val recs = rows.map { case (g, _) =>
      // reject empties loudly (same contract as wrong-family geoms):
      // JTS produces empty lines/polygons from degenerate clips, and an
      // empty part would otherwise crash deep in the bbox fold
      require(!g.isEmpty, s"writeGeoms cannot encode an EMPTY ${g.getGeometryType}")
      val parts = partsOf(g)
      require(parts.forall(_.nonEmpty),
        s"writeGeoms cannot encode a zero-point part in ${g.getGeometryType}")
      val numPoints = parts.map(_.length).sum
      (parts, 4 + 32 + 8 + 4 * parts.length + 16 * numPoints)
    }
    val shpLen = 100 + recs.map(8 + _._2).sum
    val shp = ByteBuffer.allocate(shpLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, shpLen / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, shapeType)
    val allCs = rows.flatMap(r => r._1.getCoordinates)
    if (allCs.nonEmpty) {
      shp.putDouble(36, allCs.map(_.x).min); shp.putDouble(44, allCs.map(_.y).min)
      shp.putDouble(52, allCs.map(_.x).max); shp.putDouble(60, allCs.map(_.y).max)
    }
    var off = 100
    recs.zipWithIndex.foreach { case ((parts, contentBytes), i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(off, i + 1)
      shp.putInt(off + 4, contentBytes / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      val cs = parts.flatten
      shp.putInt(off + 8, shapeType)
      shp.putDouble(off + 12, cs.map(_.x).min)
      shp.putDouble(off + 20, cs.map(_.y).min)
      shp.putDouble(off + 28, cs.map(_.x).max)
      shp.putDouble(off + 36, cs.map(_.y).max)
      shp.putInt(off + 44, parts.length)
      shp.putInt(off + 48, cs.length)
      var partStart = 0
      parts.zipWithIndex.foreach { case (p, k) =>
        shp.putInt(off + 52 + 4 * k, partStart)
        partStart += p.length
      }
      val ptsOff = off + 52 + 4 * parts.length
      cs.zipWithIndex.foreach { case (c, j) =>
        shp.putDouble(ptsOff + 16 * j, c.x)
        shp.putDouble(ptsOff + 16 * j + 8, c.y)
      }
      off += 8 + contentBytes
    }
    save(basePath, ".shp", shp.array(), conf)
    save(basePath, ".dbf", dbfBytes(rows.map(_._2), fields), conf)
  }
}

