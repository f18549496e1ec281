package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/**
 * SQLite-backed sources built on the from-scratch [[Sqlite]] parser:
 *
 *  - [[GeoPackage]]: features per `gpkg_contents`/`gpkg_geometry_columns`,
 *    GP geometry blobs unwrapped to plain WKB
 *    (reference `reader/GeoPackageReader.java`)
 *  - [[NaturalEarth]]: plain table scan of the NE sqlite distribution
 *    (reference `reader/NaturalEarthReader.java`)
 *  - [[MbtilesReader]]: tile scan supporting BOTH the simple `tiles`
 *    table and the compact deduped map+images schema
 *    (reference `mbtiles/Mbtiles.java:286-356`)
 *
 * Spark shape: a SQLite file is a single-writer artifact, so each file
 * parses in one task (the reference readers are single-threaded per
 * file too); multiple files parallelize naturally. IO is executor-side
 * and scheme-agnostic: the task opens the file through the Hadoop
 * FileSystem API and the [[Sqlite.Db]] pages through it with a small
 * LRU cache — no whole-file read on the driver, no multi-hundred-MB
 * task closure, and `hdfs://` / `s3a://` paths work unchanged.
 */
object SqliteSources {

  case class FeatureRow(table: String, fid: Long, geom: Array[Byte], attrs: Map[String, String])

  private[sources] def attrsOf(m: Map[String, Any], skip: Set[String]): Map[String, String] =
    m.collect { case (k, v) if !skip.contains(k) && v != null && !v.isInstanceOf[Array[Byte]] =>
      k -> v.toString
    }

  /** One task per file: open the Db executor-side (closed on task
    * completion — scans are lazy iterators) and emit `f`'s rows. */
  private[sources] def perFile[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, path: String)(f: Sqlite.Db => Iterator[T]): Dataset[T] = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    spark.createDataset(Seq(path)).flatMap { p =>
      val db = Sqlite.open(p, conf.value)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => db.close()))
      f(db)
    }
  }
}

object GeoPackage {
  import SqliteSources._

  /** Strip the GeoPackage binary header (magic GP, version, flags,
    * srs_id, optional envelope) to the inner standard WKB. */
  private[sources] def unwrapGpkgGeometry(blob: Array[Byte]): Array[Byte] = {
    require(blob.length > 8 && blob(0) == 'G' && blob(1) == 'P', "not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    val envelopeIndicator = (flags >> 1) & 0x7
    val envBytes = envelopeIndicator match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"bad envelope indicator $other")
    }
    java.util.Arrays.copyOfRange(blob, 8 + envBytes, blob.length)
  }

  /** Wrap standard WKB in a GeoPackage geometry blob (LE srs_id, no
    * envelope). */
  private[sources] def wrapGpkgGeometry(wkb: Array[Byte], srsId: Int = 4326): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + wkb.length)
    bb.put('G'.toByte).put('P'.toByte).put(0.toByte)
    bb.put(0x01.toByte) // flags: little-endian header, no envelope
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(srsId)
    bb.put(wkb)
    bb.array()
  }

  /**
   * Write a WGS84 feature GeoPackage of any geometry family through
   * the from-scratch SQLite page writer
   * ([[graft.engine.SqliteWriter]]): the three required meta tables +
   * one feature table, readable by [[read]] (and by stock sqlite3).
   * Attr columns come from `attrCols`; feature fids are 1..n in input
   * order; `geoms` are standard WKB (wrapped into GPKG blobs here).
   */
  def writeFeatures(path: String, table: String, attrCols: Seq[String],
                    rows: Seq[(Array[Byte], Seq[String])],
                    geometryType: String = "GEOMETRY"): Unit = {
    import graft.engine.SqliteWriter
    val wgs84 = "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"
    val attrsSql = attrCols.map(c => s"$c TEXT, ").mkString
    val featureRows = rows.map { case (wkb, vals) =>
      (vals.map(v => v: Any) :+ (wrapGpkgGeometry(wkb): Any)).toArray
    }
    SqliteWriter.write(path, Seq(
      SqliteWriter.Table("gpkg_spatial_ref_sys",
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id INTEGER, organization TEXT, organization_coordsys_id INTEGER, definition TEXT)",
        Seq(Array[Any]("WGS 84", 4326L, "EPSG", 4326L, wgs84))),
      SqliteWriter.Table("gpkg_contents",
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, identifier TEXT, srs_id INTEGER)",
        Seq(Array[Any](table, "features", table, 4326L))),
      SqliteWriter.Table("gpkg_geometry_columns",
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, geometry_type_name TEXT, srs_id INTEGER)",
        Seq(Array[Any](table, "geom", geometryType, 4326L))),
      SqliteWriter.Table(table,
        s"CREATE TABLE $table (${attrsSql}geom BLOB)", featureRows)))
  }

  /** Point-layer convenience over [[writeFeatures]]. */
  def writePoints(path: String, table: String, attrCols: Seq[String],
                  rows: Seq[(Double, Double, Seq[String])]): Unit =
    writeFeatures(path, table, attrCols,
      rows.map { case (lon, lat, vals) =>
        (graft.geo.Geo.toWkb(graft.geo.Geo.factory.createPoint(
          new org.locationtech.jts.geom.Coordinate(lon, lat))), vals)
      }, geometryType = "POINT")

  /**
   * All feature tables (or one) as (table, fid, geom WKB, attrs).
   * Each table's `srs_id` (from `gpkg_contents`, definitions resolved
   * through `gpkg_spatial_ref_sys`) is honored the way the reference's
   * GeoTools path honors it: WGS84 passes through, EPSG:3857
   * reprojects closed-form, anything else fails loudly.
   */
  def read(spark: SparkSession, path: String, table: Option[String] = None): DataFrame = {
    import spark.implicits._
    perFile[FeatureRow](spark, path)(readDb(_, table)).toDF()
  }

  /** Per-db scan body, shared by [[read]] and the DSv2 provider. */
  private[sources] def readDb(db: Sqlite.Db, table: Option[String]): Iterator[FeatureRow] = {
    {
      val geomCols: Map[String, String] = db.rows("gpkg_geometry_columns").map { case (_, m) =>
        m("table_name").toString -> m("column_name").toString
      }.toMap
      val contents = db.rows("gpkg_contents")
        .filter(_._2("data_type") == "features")
        .map(r => (r._2("table_name").toString,
          Option(r._2.getOrElse("srs_id", null)).map(_.asInstanceOf[Long]).getOrElse(4326L)))
        .toSeq
        .filter { case (t, _) => table.forall(_ == t) }
      lazy val srsDefs: Map[Long, String] =
        if (db.tableRoot("gpkg_spatial_ref_sys").isEmpty) Map.empty
        else db.rows("gpkg_spatial_ref_sys").map { case (_, m) =>
          m("srs_id").asInstanceOf[Long] ->
            Option(m.getOrElse("definition", null)).map(_.toString).getOrElse("")
        }.toMap
      contents.iterator.flatMap { case (t, srsId) =>
        val srs = graft.geo.Crs.fromSrsId(srsId, srsDefs.get(srsId))
        val gcol = geomCols.getOrElse(t, "geom")
        db.rows(t).map { case (fid, m) =>
          val geom = m.get(gcol) match {
            case Some(b: Array[Byte]) =>
              val wkb = unwrapGpkgGeometry(b)
              if (srs == graft.geo.Crs.Wgs84 || wkb.isEmpty) wkb
              else graft.geo.Geo.toWkb(
                graft.geo.Crs.toWgs84(graft.geo.Geo.fromWkb(wkb), srs))
            case _ => Array.emptyByteArray
          }
          FeatureRow(t, fid, geom, attrsOf(m, Set(gcol)))
        }
      }
    }
  }
}

object NaturalEarth {
  import SqliteSources._

  /** Scan one Natural Earth theme table; geometry column detected by
    * name (NE sqlite ships `GEOMETRY` blobs of plain WKB). */
  def read(spark: SparkSession, path: String, table: String,
           geomCol: String = "GEOMETRY"): DataFrame = {
    import spark.implicits._
    perFile[FeatureRow](spark, path) { db =>
      db.rows(table).map { case (fid, m) =>
        val geom = m.get(geomCol).orElse(m.get(geomCol.toLowerCase)) match {
          case Some(b: Array[Byte]) => b
          case _ => Array.emptyByteArray
        }
        FeatureRow(table, fid, geom, attrsOf(m, Set(geomCol, geomCol.toLowerCase)))
      }
    }.toDF()
  }
}

object MbtilesReader {
  import SqliteSources._

  case class MbTile(z: Int, x: Int, y: Int, bytes: Array[Byte])
  private case class MapRow(z: Int, x: Int, y: Int, tile_id: String)
  private case class ImageRow(tile_id: String, bytes: Array[Byte])

  /** Read every tile; handles both the plain `tiles` table and the
    * compact `map` + `images` schema. y is returned XYZ (the stored
    * TMS `tile_row` is flipped on read), matching the DSv2 readers so
    * write → read round-trips and mbtiles/pmtiles reads agree.
    * The compact schema resolves tile_id -> blob as a Spark join of two
    * per-file scans (the images table of a planet archive is tens of
    * GB — never an in-task hash map). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // cheap driver-side schema sniff: master table only (page-cached)
    val hasTilesTable = {
      val db = Sqlite.open(path, spark.sparkContext.hadoopConfiguration)
      try db.tableRoot("tiles").isDefined finally db.close()
    }
    if (hasTilesTable) {
      perFile[MbTile](spark, path) { db =>
        db.rows("tiles").map { case (_, m) =>
          val z = m("zoom_level").asInstanceOf[Long].toInt
          MbTile(z, m("tile_column").asInstanceOf[Long].toInt,
            (1 << z) - 1 - m("tile_row").asInstanceOf[Long].toInt, // TMS -> XYZ
            m("tile_data").asInstanceOf[Array[Byte]])
        }
      }.toDF()
    } else {
      val maps = perFile[MapRow](spark, path) { db =>
        db.rows("map").map { case (_, m) =>
          val z = m("zoom_level").asInstanceOf[Long].toInt
          MapRow(z, m("tile_column").asInstanceOf[Long].toInt,
            (1 << z) - 1 - m("tile_row").asInstanceOf[Long].toInt, // TMS -> XYZ
            m("tile_id").toString)
        }
      }
      val images = perFile[ImageRow](spark, path) { db =>
        db.rows("images").map { case (_, m) =>
          ImageRow(m("tile_id").toString, m("tile_data").asInstanceOf[Array[Byte]])
        }
      }
      maps.join(images, "tile_id")
        .select(maps("z"), maps("x"), maps("y"), images("bytes"))
    }
  }

  def metadata(path: String): Map[String, String] = metadata(path,
    new org.apache.hadoop.conf.Configuration())

  def metadata(path: String, conf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val db = Sqlite.open(path, conf)
    try db.rows("metadata").map { case (_, m) =>
      m("name").toString -> Option(m("value")).map(_.toString).getOrElse("")
    }.toMap
    finally db.close()
  }
}
