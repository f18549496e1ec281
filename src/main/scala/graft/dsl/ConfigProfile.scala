package graft.dsl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.engine.Profile
import graft.geo.Geo
import graft.model.{FeatureSpec, SourceFeature}
import graft.engine.Render
import org.locationtech.jts.geom.{LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}

/**
 * Declarative profile: a JSON or YAML schema config compiled to a
 * `Profile` — the analog of the reference's custommap front end
 * (`planetiler-custommap/ConfiguredProfile.java`): parse -> analyze
 * (filters become the `graft.dsl.Expr` ADT, simplified at load time)
 * -> execute through the exact same physical pipeline as the coded
 * profile API.
 *
 * JSON schema (native):
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
 *
 * YAML schema ([[compileYaml]]): the custommap dialect — top-level
 * `tag_mappings` (type coercions) and `layers: [{id, features:
 * [{source, geometry, min_zoom, max_zoom, include_when, exclude_when,
 * attributes: [{key, value|tag, min_zoom, include_when}]}]}]`, with
 * anchors/aliases/merge keys handled by [[Yaml]]. Boolean expressions:
 * a mapping is an OR of `tagKey: value|[values]` entries (`%`
 * wildcards), `__all__` wraps AND, `__not__` negates, value `__any__`
 * matches presence, `source: [s]` matches the feature source, and the
 * nested `tag: {key: k, value: [vs]}` form is accepted (reference
 * custommap README "Boolean Expression").
 */
object ConfigProfile {

  /** `value` starting with `${` compiles to an inline script (CEL
    * analog, see [[Script]]); constants fold at parse time. `when`
    * gates the attribute on a per-feature condition (custommap's
    * per-attribute `include_when`). */
  case class AttrMapping(key: String, tag: Option[String], value: Option[String], minzoom: Int,
                         when: Expr = True) {
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

  /** Compile a JSON config into a Profile runnable by the engine. */
  def compile(json: String): Profile = build(parse(json), Map.empty)

  // ---------------- YAML (custommap dialect) front end ----------------

  /** Custommap boolean expression from a YAML node. */
  def parseYamlExpr(y: Yaml.Y): Expr = y match {
    case Yaml.YScalar(b: Boolean) => if (b) True else False
    case Yaml.YScalar(null) => True
    case Yaml.YSeq(items) => Or(items.map(parseYamlExpr))
    case m: Yaml.YMap =>
      Or(m.entries.map {
        case ("__all__", v) => v match {
          case mm: Yaml.YMap => And(mm.entries.map(e => parseYamlExpr(Yaml.YMap(Vector(e)))))
          case Yaml.YSeq(items) => And(items.map(parseYamlExpr))
          case other => parseYamlExpr(other)
        }
        case ("__not__", v) => Not(parseYamlExpr(v))
        case ("source", v) => MatchSource(valuesOf(v))
        case ("tag", tm: Yaml.YMap) =>
          tm.get("value") match {
            case None => MatchField(tm("key").str)
            case Some(v) => MatchAny(tm("key").str, valuesOf(v))
          }
        case (k, Yaml.YScalar("__any__")) => MatchField(k)
        case (k, v) => MatchAny(k, valuesOf(v))
      })
    case other => throw new IllegalArgumentException(s"bad boolean expression: $other")
  }

  private def valuesOf(y: Yaml.Y): Seq[String] = y match {
    case Yaml.YSeq(items) => items.map(scalarString)
    case s: Yaml.YScalar => Seq(scalarString(s))
    case other => throw new IllegalArgumentException(s"expected scalar or list: $other")
  }
  private def scalarString(y: Yaml.Y): String = y.asScalar match {
    case null => ""
    case b: Boolean => b.toString
    case other => other.toString
  }

  /** Parse a custommap-dialect YAML schema into layer configs +
    * tag-type coercions. */
  def parseYaml(yaml: String): (Seq[LayerConfig], Map[String, String]) = {
    val root = Yaml.parse(yaml).asMap
    val tagMappings: Map[String, String] = root.get("tag_mappings").map {
      case m: Yaml.YMap => m.entries.map { case (k, v) => k -> v.str }.toMap
      case other => throw new IllegalArgumentException(s"tag_mappings not a map: $other")
    }.getOrElse(Map.empty)
    val configs = for {
      layer <- root("layers").asSeq
      lm = layer.asMap
      id = lm("id").str
      feature <- lm("features").asSeq
      fm = feature.asMap
    } yield {
      val include = fm.get("include_when").map(parseYamlExpr).getOrElse(True)
      val exclude = fm.get("exclude_when").map(parseYamlExpr).getOrElse(False)
      val src = fm.get("source").map(v => MatchSource(valuesOf(v))).getOrElse(True)
      val attrs = fm.get("attributes").map(_.asSeq).getOrElse(Vector.empty).map { a =>
        val am = a.asMap
        val key = am("key").str
        val value = am.get("value").map(scalarString)
        AttrMapping(
          key = key,
          tag = am.get("tag").map(_.str).orElse(if (value.isEmpty) Some(key) else None),
          value = value,
          minzoom = am.get("min_zoom").map(_.int).getOrElse(0),
          when = am.get("include_when").map(parseYamlExpr).getOrElse(True).simplify)
      }
      LayerConfig(
        name = id,
        geometry = fm.get("geometry").map(_.str).getOrElse("any"),
        minzoom = fm.get("min_zoom").map(_.int).getOrElse(0),
        maxzoom = fm.get("max_zoom").map(_.int).getOrElse(8),
        filter = And(Seq(src, include, Not(exclude))).simplify,
        attrs = attrs,
        labelGridSize = 0.0, labelGridLimit = 0)
    }
    (configs, tagMappings)
  }

  /** Compile a custommap-dialect YAML schema into a Profile. */
  def compileYaml(yaml: String): Profile = {
    val (configs, tagMappings) = parseYaml(yaml)
    build(configs, tagMappings)
  }

  /** Type coercion per `tag_mappings` (reference custommap README
    * "Tag Mappings"): normalize the raw tag string before it is
    * emitted as an attribute value. */
  private[dsl] def coerce(typ: String, raw: String): Option[String] = typ match {
    case "boolean" =>
      Some((!Set("no", "false", "0", "").contains(raw.trim.toLowerCase)).toString)
    case "long" | "integer" =>
      "^[-+]?\\d+".r.findFirstIn(raw.trim).map(_.toLong.toString)
    case "double" =>
      try Some(raw.trim.toDouble.toString) catch { case _: NumberFormatException => None }
    case _ => Some(raw)
  }

  /** Compile layer configs into a Profile runnable by the engine. */
  private def build(layerConfigs0: Seq[LayerConfig], tagMappings: Map[String, String]): Profile =
    new Profile {
      private val layerConfigs = layerConfigs0
      override val layers: IndexedSeq[String] = layerConfigs.map(_.name).distinct.toIndexedSeq

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
            val live = lc.attrs.filter(_.when.evaluate(sf.tags, sf.source))
            val base = live.filter(_.minzoom <= lc.minzoom).flatMap(resolve(sf)).toMap
            val overrides = live.filter(_.minzoom > lc.minzoom).flatMap { a =>
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
              .orElse(a.tag.flatMap { t =>
                sf.tags.get(t).filter(_.nonEmpty)
                  .flatMap(raw => coerce(tagMappings.getOrElse(t, "string"), raw))
                  .map(v => a.key -> v)
              })
        }
    }
}
