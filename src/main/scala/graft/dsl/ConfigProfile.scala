package graft.dsl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.engine.Profile
import graft.geo.Geo
import graft.model.{FeatureSpec, SourceFeature}
import graft.engine.Render
import org.locationtech.jts.geom.{LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}

/**
 * Declarative profile: a JSON schema config compiled to a `Profile` —
 * the analog of the reference's custommap YAML front end
 * (`planetiler-custommap/ConfiguredProfile.java`): parse -> analyze
 * (filters become the `graft.dsl.Expr` ADT, simplified at load time)
 * -> execute through the exact same physical pipeline as the coded
 * profile API.
 *
 * Schema:
 * {
 *   "layers": [{
 *     "name": "roads", "geometry": "point|line|polygon|any",
 *     "minzoom": 4, "maxzoom": 12,
 *     "filter": { ...expression... },
 *     "attrs": [{"key": "class", "tag": "kind"},
 *               {"key": "fixed", "value": "1"},
 *               {"key": "hi", "tag": "name", "minzoom": 10}],
 *     "labelGrid": {"size": 64, "limit": 16}
 *   }]
 * }
 *
 * Expression JSON: {"and":[...]}, {"or":[...]}, {"not":{...}},
 * {"matchAny":{"field":"k","values":["a","%b%"]}},
 * {"matchField":"k"}, {"matchSource":["s"]}, true, false.
 */
object ConfigProfile {

  /** `value` starting with `${` compiles to an inline script (CEL
    * analog, see [[Script]]); constants fold at parse time. */
  case class AttrMapping(key: String, tag: Option[String], value: Option[String], minzoom: Int) {
    val script: Option[Script.Compiled] =
      value.filter(Script.isScript).map(Script.compile)
  }
  case class LayerConfig(name: String, geometry: String, minzoom: Int, maxzoom: Int,
                         filter: Expr, attrs: Seq[AttrMapping],
                         labelGridSize: Double, labelGridLimit: Int)

  def parseExpr(n: JsonNode): Expr = {
    if (n.isBoolean) { if (n.asBoolean()) True else False }
    else if (n.has("and")) And((0 until n.get("and").size()).map(i => parseExpr(n.get("and").get(i))))
    else if (n.has("or")) Or((0 until n.get("or").size()).map(i => parseExpr(n.get("or").get(i))))
    else if (n.has("not")) Not(parseExpr(n.get("not")))
    else if (n.has("matchAny")) {
      val m = n.get("matchAny")
      val vs = m.get("values")
      MatchAny(m.get("field").asText(), (0 until vs.size()).map(i => vs.get(i).asText()))
    }
    else if (n.has("matchField")) MatchField(n.get("matchField").asText())
    else if (n.has("matchSource")) {
      val vs = n.get("matchSource")
      MatchSource((0 until vs.size()).map(i => vs.get(i).asText()))
    }
    else throw new IllegalArgumentException(s"unknown expression: $n")
  }

  def parse(json: String): Seq[LayerConfig] = {
    val root = new ObjectMapper().readTree(json)
    val layers = root.get("layers")
    (0 until layers.size()).map { i =>
      val l = layers.get(i)
      val attrs = Option(l.get("attrs")).toSeq.flatMap { as =>
        (0 until as.size()).map { j =>
          val a = as.get(j)
          AttrMapping(
            a.get("key").asText(),
            Option(a.get("tag")).map(_.asText()),
            Option(a.get("value")).map(_.asText()),
            Option(a.get("minzoom")).map(_.asInt()).getOrElse(0))
        }
      }
      val lg = Option(l.get("labelGrid"))
      LayerConfig(
        name = l.get("name").asText(),
        geometry = Option(l.get("geometry")).map(_.asText()).getOrElse("any"),
        minzoom = Option(l.get("minzoom")).map(_.asInt()).getOrElse(0),
        maxzoom = Option(l.get("maxzoom")).map(_.asInt()).getOrElse(8),
        filter = Option(l.get("filter")).map(parseExpr).getOrElse(True).simplify,
        attrs = attrs,
        labelGridSize = lg.map(_.get("size").asDouble()).getOrElse(0.0),
        labelGridLimit = lg.map(_.get("limit").asInt()).getOrElse(0))
    }
  }

  /** Compile a config into a Profile runnable by the engine. */
  def compile(json: String): Profile = new Profile {
    private val layerConfigs = parse(json)
    override val layers: IndexedSeq[String] = layerConfigs.map(_.name).toIndexedSeq

    override def processFeature(sf: SourceFeature): Iterator[FeatureSpec] = {
      lazy val geom = Geo.fromWkb(sf.geom)
      lazy val world = Render.worldWkb(geom)
      layerConfigs.iterator.flatMap { lc =>
        val geomOk = lc.geometry match {
          case "point" => geom.isInstanceOf[Point] || geom.isInstanceOf[MultiPoint]
          case "line" => geom.isInstanceOf[LineString] || geom.isInstanceOf[MultiLineString]
          case "polygon" => geom.isInstanceOf[Polygon] || geom.isInstanceOf[MultiPolygon]
          case _ => true
        }
        if (!geomOk || !lc.filter.evaluate(sf.tags, sf.source)) None
        else {
          // zoom-independent attrs resolve now; minzoom'd attrs resolve
          // per zoom at render time via zoomAttrs
          val base = lc.attrs.filter(_.minzoom <= lc.minzoom).flatMap(resolve(sf)).toMap
          val overrides = lc.attrs.filter(_.minzoom > lc.minzoom).flatMap { a =>
            resolve(sf)(a).map(kv => (a.minzoom, kv))
          }.groupBy(_._1).map { case (z, kvs) => z -> kvs.map(_._2).toMap }
          Some(FeatureSpec(
            layer = lc.name, geom = world,
            id = math.abs(sf.doc_id.hashCode).toLong,
            sortKey = 0, minzoom = lc.minzoom, maxzoom = lc.maxzoom,
            attrs = base, zoomAttrs = overrides.toSeq.sortBy(_._1),
            labelGridPixelSize = lc.labelGridSize, labelGridLimit = lc.labelGridLimit))
        }
      }
    }

    private def resolve(sf: SourceFeature)(a: AttrMapping): Option[(String, String)] =
      a.script match {
        case Some(sc) =>
          Option(sc.evalString(sf.tags, math.abs(sf.doc_id.hashCode).toLong, sf.source))
            .map(v => a.key -> v)
        case None =>
          a.value.map(v => a.key -> v)
            .orElse(a.tag.flatMap(t => sf.tags.get(t)).filter(_.nonEmpty).map(v => a.key -> v))
      }
  }
}
