package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
 * file too); multiple files parallelize naturally.
 */
object SqliteSources {

  case class FeatureRow(table: String, fid: Long, geom: Array[Byte], attrs: Map[String, String])

  private[sources] def attrsOf(m: Map[String, Any], skip: Set[String]): Map[String, String] =
    m.collect { case (k, v) if !skip.contains(k) && v != null && !v.isInstanceOf[Array[Byte]] =>
      k -> v.toString
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

  /** All feature tables (or one) as (table, fid, geom WKB, attrs). */
  def read(spark: SparkSession, path: String, table: Option[String] = None): DataFrame = {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    spark.createDataset(Seq(path)).flatMap { _ =>
      val db = new Sqlite.Db(bytes)
      val geomCols: Map[String, String] = db.rows("gpkg_geometry_columns").map { case (_, m) =>
        m("table_name").toString -> m("column_name").toString
      }.toMap
      val featureTables = db.rows("gpkg_contents")
        .filter(_._2("data_type") == "features")
        .map(_._2("table_name").toString).toSeq
        .filter(t => table.forall(_ == t))
      featureTables.iterator.flatMap { t =>
        val gcol = geomCols.getOrElse(t, "geom")
        db.rows(t).map { case (fid, m) =>
          val geom = m.get(gcol) match {
            case Some(b: Array[Byte]) => unwrapGpkgGeometry(b)
            case _ => Array.emptyByteArray
          }
          FeatureRow(t, fid, geom, attrsOf(m, Set(gcol)))
        }
      }
    }.toDF()
  }
}

object NaturalEarth {
  import SqliteSources._

  /** Scan one Natural Earth theme table; geometry column detected by
    * name (NE sqlite ships `GEOMETRY` blobs of plain WKB). */
  def read(spark: SparkSession, path: String, table: String,
           geomCol: String = "GEOMETRY"): DataFrame = {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    spark.createDataset(Seq(path)).flatMap { _ =>
      val db = new Sqlite.Db(bytes)
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

  case class MbTile(z: Int, x: Int, y: Int, bytes: Array[Byte])

  /** Read every tile; handles both the plain `tiles` table and the
    * compact `map` + `images` schema. y stays TMS (flipped) as stored. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    spark.createDataset(Seq(path)).flatMap { _ =>
      val db = new Sqlite.Db(bytes)
      val hasTilesTable = db.tableRoot("tiles").isDefined
      if (hasTilesTable) {
        db.rows("tiles").map { case (_, m) =>
          MbTile(m("zoom_level").asInstanceOf[Long].toInt,
            m("tile_column").asInstanceOf[Long].toInt,
            m("tile_row").asInstanceOf[Long].toInt,
            m("tile_data").asInstanceOf[Array[Byte]])
        }
      } else {
        // compact schema: map(zoom,col,row,tile_id) + images(tile_id,data)
        val images = db.rows("images").map { case (_, m) =>
          m("tile_id").toString -> m("tile_data").asInstanceOf[Array[Byte]]
        }.toMap
        db.rows("map").map { case (_, m) =>
          MbTile(m("zoom_level").asInstanceOf[Long].toInt,
            m("tile_column").asInstanceOf[Long].toInt,
            m("tile_row").asInstanceOf[Long].toInt,
            images(m("tile_id").toString))
        }
      }
    }.toDF()
  }

  def metadata(path: String): Map[String, String] = {
    val db = Sqlite.open(path)
    db.rows("metadata").map { case (_, m) =>
      m("name").toString -> Option(m("value")).map(_.toString).getOrElse("")
    }.toMap
  }
}
