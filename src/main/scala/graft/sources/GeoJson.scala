package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.geo.Geo
import graft.model.{Doc, Span}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom._

/**
 * GeoJSON source (reference `reader/geojson/GeoJsonReader.java`):
 * newline-delimited GeoJSON Features (or FeatureCollections) ->
 * the engine's docs table. Geometry decode is a small Jackson-tree ->
 * JTS converter (all seven GeoJSON geometry types); properties become
 * text spans so features ride the same interleaved-docs pipeline.
 */
object GeoJson {

  private val mapperTl = ThreadLocal.withInitial[ObjectMapper](() => new ObjectMapper())

  /** Parse one GeoJSON geometry object -> JTS (lon/lat). */
  def parseGeometry(node: JsonNode): Geometry = {
    val gf = Geo.factory
    def pt(c: JsonNode) = new Coordinate(c.get(0).asDouble(), c.get(1).asDouble())
    def line(cs: JsonNode): Array[Coordinate] =
      (0 until cs.size()).map(i => pt(cs.get(i))).toArray
    def poly(rings: JsonNode): Polygon = {
      val shell = gf.createLinearRing(line(rings.get(0)))
      val holes = (1 until rings.size()).map(i => gf.createLinearRing(line(rings.get(i))))
      gf.createPolygon(shell, holes.toArray)
    }
    val coords = node.get("coordinates")
    node.get("type").asText() match {
      case "Point" => gf.createPoint(pt(coords))
      case "MultiPoint" => gf.createMultiPointFromCoords(line(coords))
      case "LineString" => gf.createLineString(line(coords))
      case "MultiLineString" =>
        gf.createMultiLineString((0 until coords.size()).map(i =>
          gf.createLineString(line(coords.get(i)))).toArray)
      case "Polygon" => poly(coords)
      case "MultiPolygon" =>
        gf.createMultiPolygon((0 until coords.size()).map(i => poly(coords.get(i))).toArray)
      case "GeometryCollection" =>
        val gs = node.get("geometries")
        gf.createGeometryCollection((0 until gs.size()).map(i => parseGeometry(gs.get(i))).toArray)
      case other => throw new IllegalArgumentException(s"unknown geometry type $other")
    }
  }

  def parseGeometryJson(json: String): Geometry =
    parseGeometry(mapperTl.get().readTree(json))

  /**
   * Read newline-delimited GeoJSON features into the docs shape:
   * one doc per feature; geometry as a WKT geom span; each property
   * as a text span "key=value" (order preserved via offsets).
   */
  def readFeatures(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.textFile(path).flatMap { rawLine =>
      val line = rawLine.trim
      if (line.isEmpty) None
      else {
        val mapper = mapperTl.get()
        val node = mapper.readTree(line)
        val features: Seq[JsonNode] =
          Option(node.get("type")).map(_.asText()).getOrElse("") match {
            case "FeatureCollection" =>
              val fs = node.get("features")
              if (fs == null || fs.isNull) Seq.empty else (0 until fs.size()).map(fs.get)
            case "Feature" => Seq(node)
            case _ => Seq.empty
          }
        features.zipWithIndex.map { case (f, i) =>
          // RFC 7946 allows "geometry": null (unlocated feature) — keep
          // the doc, just without a geom span
          val geom = Option(f.get("geometry")).filter(!_.isNull).map(parseGeometry)
          // id-less features get a line-content hash so distinct
          // features on distinct ndjson lines never collide on "f0"
          val id = Option(f.get("id")).filter(!_.isNull).map(_.asText()).getOrElse(
            s"f${i}_${java.lang.Long.toHexString(graft.engine.Mvt.fnv1a64(line.getBytes("UTF-8")))}")
          val props = Option(f.get("properties")).filter(!_.isNull).toSeq.flatMap { p =>
            val it = p.properties().iterator()
            val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            while (it.hasNext) {
              val e = it.next()
              // asText() silently empties object/array values — keep
              // containers as their JSON serialization
              val v = if (e.getValue.isContainerNode) e.getValue.toString else e.getValue.asText()
              buf += (e.getKey -> v)
            }
            buf
          }
          val spans =
            props.zipWithIndex.map { case ((k, v), off) =>
              Span("text", s"$k=$v", null, off)
            } ++ geom.map(g => Span("geom", Geo.toWkt(g), null, props.size)).toSeq
          Doc(s"gj_$id", spans)
        }
      }
    }
  }
}
