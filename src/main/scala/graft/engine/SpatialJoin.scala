package graft.engine

import graft.geo.Geo
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.STRtree
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Spatial joins, Spark-first.
 *
 * Point-in-polygon: the polygon side (admin/landuse layers) is small
 * relative to the probe side, so we BROADCAST an STRtree of prepared
 * polygons and probe it per partition — the distributed analog of the
 * reference's in-process `geo/PolygonIndex.java` (envelope prefilter +
 * exact contains post-filter). No shuffle touches the big side.
 *
 * kNN: same broadcast-index pattern over polygon/point sites
 * (reference `geo/PointIndex.java`), returning the nearest site within
 * a max distance. For large-large variants, the cell-key equi-join path
 * (`CellJoin`) applies.
 */
object SpatialJoin {

  /** Serializable polygon payload; tree is rebuilt lazily per executor. */
  case class Poly(id: String, wkb: Array[Byte], attrs: Map[String, String])

  /** Natural id order: ids with a numeric suffix ("adm_12") compare by
    * (prefix, number) so tie-breaks match numeric-id oracles. */
  private[engine] def idLt(a: String, b: String): Boolean = {
    val (pa, na) = splitNumFor(a)
    val (pb, nb) = splitNumFor(b)
    if (pa != pb) pa < pb else if (na != nb) na < nb else a < b
  }

  class PolygonIndex(polys: Array[Poly]) extends Serializable {
    @transient private lazy val tree: STRtree = {
      val t = new STRtree()
      polys.foreach { p =>
        val g = Geo.fromWkb(p.wkb)
        t.insert(g.getEnvelopeInternal, (p, PreparedGeometryFactory.prepare(g)))
      }
      t.build()
      t
    }

    /** Smallest-id polygon covering the point (envelope prefilter +
      * exact covers; min-id tie-break keeps boundary points
      * deterministic regardless of tree order). */
    def firstContaining(lon: Double, lat: Double): Option[Poly] = {
      val pt = Geo.point(lon, lat)
      val hits = tree.query(new Envelope(lon, lon, lat, lat))
      var best: Poly = null
      val it = hits.iterator()
      while (it.hasNext) {
        val (p, prep) = it.next().asInstanceOf[(Poly, PreparedGeometry)]
        if ((best == null || idLt(p.id, best.id)) && prep.covers(pt)) best = p
      }
      Option(best)
    }

    def allIntersecting(g: Geometry): Seq[Poly] = {
      val hits = tree.query(g.getEnvelopeInternal)
      val out = scala.collection.mutable.ArrayBuffer.empty[Poly]
      val it = hits.iterator()
      while (it.hasNext) {
        val (p, prep) = it.next().asInstanceOf[(Poly, PreparedGeometry)]
        if (prep.intersects(g)) out += p
      }
      out.toSeq
    }
  }

  /**
   * points(doc_id, lon, lat) JOIN broadcast(polygons) ON contains.
   * Returns probe columns + polygon id/attrs. Inner join (unmatched
   * probes dropped) or left (poly_id null).
   */
  /** Cap on the broadcast polygon side: like any broadcast join, the
    * build side must fit in executor memory. Callers with a bigger
    * polygon layer should tile-partition it first. */
  val MaxBroadcastPolys = 2000000

  /** Collect a polygon DataFrame (doc_id, geom WKB, tags) into the
    * broadcastable form, refusing unboundedly large sides — keeps the
    * `collect()` behind one guarded door instead of in every caller. */
  def collectPolys(polysDf: DataFrame,
                   idCol: String = "doc_id", geomCol: String = "geom",
                   tagsCol: String = "tags"): Array[Poly] = {
    val rows = polysDf.select(col(idCol), col(geomCol), col(tagsCol))
      .limit(MaxBroadcastPolys + 1).collect()
    require(rows.length <= MaxBroadcastPolys,
      s"polygon side exceeds $MaxBroadcastPolys rows — too large to broadcast; " +
        "tile-partition the polygon layer and use a partitioned join instead")
    rows.map(r => Poly(r.getString(0), r.getAs[Array[Byte]](1),
      r.getAs[Map[String, String]](2)))
  }

  def pointInPolygon(points: DataFrame, polys: Array[Poly],
                     lonCol: String = "lon", latCol: String = "lat",
                     left: Boolean = false): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val bcast = spark.sparkContext.broadcast(new PolygonIndex(polys))
    val schema = org.apache.spark.sql.types.StructType(points.schema.fields :+
      org.apache.spark.sql.types.StructField("poly_id", org.apache.spark.sql.types.StringType, nullable = true))
    val lonIdx = points.schema.fieldIndex(lonCol)
    val latIdx = points.schema.fieldIndex(latCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    points.mapPartitions { it =>
      val idx = bcast.value
      it.flatMap { row =>
        val hit = idx.firstContaining(row.getDouble(lonIdx), row.getDouble(latIdx))
        if (hit.isEmpty && !left) None
        else Some(org.apache.spark.sql.Row.fromSeq(row.toSeq :+ hit.map(_.id).orNull))
      }
    }(enc)
  }

  /**
   * BIG-BIG point-in-polygon: when the polygon side exceeds the
   * broadcast cap, both sides key by a mercator grid cell at
   * `gridZoom` and equi-join — polygons fan out to the cells their
   * envelope covers (each point lives in exactly ONE cell, so no
   * dedup is needed), the exact covers() test filters candidates
   * row-wise, and the smallest-id winner per point reproduces the
   * broadcast path's tie-break exactly (the (prefix, numeric-suffix,
   * id) order of [[idLt]], via min_by over a sortable struct).
   *
   * Shuffle shape: one equi-join on the cell key + one groupBy on the
   * point id. Cell fan-out of a polygon is O(envelope area in cells):
   * pick `gridZoom` so typical polygons cover few cells; continent-
   * scale layers should pre-split (the render pipeline's slicer
   * already does).
   */
  def pointInPolygonPartitioned(points: DataFrame, polysDf: DataFrame,
                                gridZoom: Int = 7,
                                idCol: String = "doc_id",
                                lonCol: String = "lon", latCol: String = "lat",
                                polyIdCol: String = "doc_id", polyGeomCol: String = "geom",
                                left: Boolean = false): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    import graft.geo.Mercator
    val n = 1 << gridZoom
    val polyCells = polysDf.select(col(polyIdCol).cast("string").as("poly_id"),
        col(polyGeomCol).as("poly_wkb"))
      .as[(String, Array[Byte])]
      .flatMap { case (id, wkb) =>
        val env = Geo.fromWkb(wkb).getEnvelopeInternal
        val x0 = Mercator.tileIndex(Mercator.worldX(env.getMinX), gridZoom)
        val x1 = Mercator.tileIndex(Mercator.worldX(env.getMaxX), gridZoom)
        val y0 = Mercator.tileIndex(Mercator.worldY(env.getMaxY), gridZoom)
        val y1 = Mercator.tileIndex(Mercator.worldY(env.getMinY), gridZoom)
        val (prefix, num) = splitNumFor(id)
        for (x <- x0 to x1; y <- y0 to y1)
          yield (x.toLong * n + y, id, wkb, prefix, num)
      }.toDF("cell", "poly_id", "poly_wkb", "poly_prefix", "poly_num")
    import graft.functions.GeoFunctions.{world_x, world_y}
    def cellIdx(w: org.apache.spark.sql.Column) =
      least(greatest(floor(w * n), lit(0)), lit(n - 1)).cast("long")
    val ptCells = points.withColumn("__cell",
      cellIdx(world_x(col(lonCol))) * n + cellIdx(world_y(col(latCol))))
    val matches = ptCells
      .join(polyCells, col("__cell") === col("cell"))
      .where(graft.functions.SpatialRules.st_contains_lonlat(
        col("poly_wkb"), col(lonCol), col(latCol)))
      .groupBy(col(idCol))
      .agg(min_by(col("poly_id"),
        struct(col("poly_prefix"), col("poly_num"), col("poly_id"))).as("poly_id"))
    points.join(matches, Seq(idCol), if (left) "left" else "inner")
  }

  private[engine] def splitNumFor(s: String): (String, Long) = {
    val i = s.lastIndexOf('_')
    if (i >= 0 && i < s.length - 1 && s.substring(i + 1).forall(_.isDigit))
      (s.substring(0, i), s.substring(i + 1).toLong)
    else (s, Long.MaxValue)
  }

  /** Serializable point-site payload for kNN. */
  case class Site(id: String, lon: Double, lat: Double)

  class SiteIndex(sites: Array[Site]) extends Serializable {
    @transient private lazy val tree: STRtree = {
      val t = new STRtree()
      sites.foreach(s => t.insert(new Envelope(s.lon, s.lon, s.lat, s.lat), s))
      t.build()
      t
    }

    /** Nearest site by squared lon/lat distance (expanding-ring search). */
    def nearest(lon: Double, lat: Double, startRadius: Double, maxRadius: Double): Option[Site] = {
      var r = startRadius
      while (r <= maxRadius) {
        val hits = tree.query(new Envelope(lon - r, lon + r, lat - r, lat + r))
        if (!hits.isEmpty) {
          var best: Site = null
          var bestD = Double.MaxValue
          val it = hits.iterator()
          while (it.hasNext) {
            val s = it.next().asInstanceOf[Site]
            val d = (s.lon - lon) * (s.lon - lon) + (s.lat - lat) * (s.lat - lat)
            if (d < bestD || (d == bestD && (best == null || s.id < best.id))) { bestD = d; best = s }
          }
          // candidates in the box are only guaranteed complete within r
          if (math.sqrt(bestD) <= r) return Some(best)
        }
        r *= 4
      }
      None
    }

    def within(lon: Double, lat: Double, radius: Double): Seq[Site] = {
      val hits = tree.query(new Envelope(lon - radius, lon + radius, lat - radius, lat + radius))
      val out = scala.collection.mutable.ArrayBuffer.empty[Site]
      val it = hits.iterator()
      while (it.hasNext) {
        val s = it.next().asInstanceOf[Site]
        val d = (s.lon - lon) * (s.lon - lon) + (s.lat - lat) * (s.lat - lat)
        if (d <= radius * radius) out += s
      }
      out.toSeq
    }
  }

  /** Nearest-site join: broadcast STRtree of sites, probe per partition. */
  def nearestSite(points: DataFrame, sites: Array[Site],
                  lonCol: String = "lon", latCol: String = "lat",
                  maxRadius: Double = 360.0, startRadius: Double = 8.0): DataFrame = {
    val spark = points.sparkSession
    val bcast = spark.sparkContext.broadcast(new SiteIndex(sites))
    val schema = org.apache.spark.sql.types.StructType(points.schema.fields :+
      org.apache.spark.sql.types.StructField("site_id", org.apache.spark.sql.types.StringType, nullable = true))
    val lonIdx = points.schema.fieldIndex(lonCol)
    val latIdx = points.schema.fieldIndex(latCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    points.mapPartitions { it =>
      val idx = bcast.value
      it.map { row =>
        val hit = idx.nearest(row.getDouble(lonIdx), row.getDouble(latIdx), startRadius, maxRadius)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ hit.map(_.id).orNull)
      }
    }(enc)
  }
}
