package graft.dsl

import graft.engine.Profile
import graft.geo.Geo
import graft.model.{FeatureSpec, SourceFeature}
import org.locationtech.jts.geom.{LineString, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}

/**
 * Self-testing `examples:` blocks for declarative YAML profiles — the
 * user-facing test harness of the schema front end (reference
 * `validator/BaseSchemaValidator.java:279`,
 * `validator/SchemaSpecification.java`): each example gives an input
 * source feature (source, geometry, tags) and the vector-tile features
 * the schema must produce (layer, geometry, zoom range, tags at a
 * zoom); the validator runs the input through the COMPILED profile —
 * the exact object the pipeline executes — and reports per-example
 * issues.
 */
object SchemaValidator {

  case class ExampleResult(name: String, issues: Seq[String]) {
    def ok: Boolean = issues.isEmpty
  }
  case class Result(results: Seq[ExampleResult]) {
    def ok: Boolean = results.forall(_.ok)
    def report: String = results.map { r =>
      val status = if (r.ok) "ok" else "FAIL"
      s"$status ${r.name}" + r.issues.map("\n  - " + _).mkString
    }.mkString("\n")
  }

  private val CannedGeoms = Map(
    "point" -> "POINT (1 1)",
    "line" -> "LINESTRING (0 0, 1 1)",
    "polygon" -> "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")

  /** Compile the schema and run its own `examples:` block. */
  def validate(schemaYaml: String): Result = {
    val profile = ConfigProfile.compileYaml(schemaYaml)
    validateExamples(profile, schemaYaml)
  }

  /** Run the `examples:` from `specYaml` against an already-compiled
    * profile (the spec may live in a separate file, reference
    * `SchemaSpecification.load`). */
  def validateExamples(profile: Profile, specYaml: String): Result = {
    val root = Yaml.parse(specYaml).asMap
    val examples = root.get("examples").map(_.asSeq).getOrElse(Vector.empty)
    Result(examples.map(e => runExample(profile, e.asMap)))
  }

  private def scalarStr(y: Yaml.Y): String = y.asScalar match {
    case null => null
    case b: Boolean => b.toString
    case other => other.toString
  }

  private def geomKind(spec: FeatureSpec): String = Geo.fromWkb(spec.geom) match {
    case _: Point | _: MultiPoint => "point"
    case _: LineString | _: MultiLineString => "line"
    case _: Polygon | _: MultiPolygon => "polygon"
    case _ => "unknown"
  }

  /** Effective attrs at a zoom: base plus every zoom override whose
    * threshold is reached, in threshold order. */
  private def attrsAtZoom(spec: FeatureSpec, zoom: Int): Map[String, String] =
    spec.zoomAttrs.filter(_._1 <= zoom).foldLeft(spec.attrs)(_ ++ _._2)

  private def runExample(profile: Profile, em: Yaml.YMap): ExampleResult = {
    val name = em.get("name").map(_.str).getOrElse("unnamed")
    try {
      val input = em("input").asMap
      val source = input.get("source").map(_.str).getOrElse("")
      val geometry = input.get("geometry").map(_.str).getOrElse("point")
      val tags = input.get("tags").map(_.asMap.entries.map { case (k, v) =>
        k -> Option(scalarStr(v)).getOrElse("")
      }.toMap).getOrElse(Map.empty[String, String])
      val wkt = CannedGeoms.getOrElse(geometry,
        return ExampleResult(name, Seq(s"unknown input geometry '$geometry'")))
      val sf = SourceFeature(s"example:$name", source, Geo.toWkb(Geo.fromWktOrNull(wkt)), tags, 0L)
      val got = profile.processFeature(sf).toSeq

      // output accepts a single mapping or a list (reference
      // ACCEPT_SINGLE_VALUE_AS_ARRAY)
      val expected: Vector[Yaml.YMap] = em.get("output") match {
        case None | Some(Yaml.YScalar(null)) => Vector.empty
        case Some(Yaml.YSeq(items)) => items.map(_.asMap)
        case Some(m: Yaml.YMap) => Vector(m)
        case Some(other) => return ExampleResult(name, Seq(s"bad output spec: $other"))
      }

      val issues = scala.collection.mutable.ArrayBuffer.empty[String]
      if (expected.isEmpty && got.nonEmpty)
        issues += s"expected no output, got features in layers ${got.map(_.layer).distinct.mkString(", ")}"
      expected.foreach { exp =>
        val layer = exp("layer").str
        got.find(_.layer == layer) match {
          case None =>
            issues += s"layer '$layer': no output feature (got ${if (got.isEmpty) "none" else got.map(_.layer).mkString(", ")})"
          case Some(spec) =>
            exp.get("geometry").map(_.str).foreach { g =>
              if (geomKind(spec) != g) issues += s"layer '$layer': geometry ${geomKind(spec)} != $g"
            }
            exp.get("min_zoom").map(_.int).foreach { z =>
              if (spec.minzoom != z) issues += s"layer '$layer': min_zoom ${spec.minzoom} != $z"
            }
            exp.get("max_zoom").map(_.int).foreach { z =>
              if (spec.maxzoom != z) issues += s"layer '$layer': max_zoom ${spec.maxzoom} != $z"
            }
            val atZoom = exp.get("at_zoom").map(_.int).getOrElse(spec.maxzoom)
            val actual = attrsAtZoom(spec, atZoom)
            val expTags = exp.get("tags").map(_.asMap.entries).getOrElse(Vector.empty)
            expTags.foreach { case (k, v) =>
              val want = scalarStr(v)
              (actual.get(k), Option(want)) match {
                case (None, Some(w)) => issues += s"layer '$layer': tag $k missing (expected '$w')"
                case (Some(a), Some(w)) if a != w => issues += s"layer '$layer': tag $k = '$a' != '$w'"
                case (Some(a), None) => issues += s"layer '$layer': tag $k = '$a' expected absent"
                case _ =>
              }
            }
            val allowExtra = exp.get("allow_extra_tags").forall(_.bool)
            if (!allowExtra) {
              val extra = actual.keySet -- expTags.map(_._1).toSet
              if (extra.nonEmpty) issues += s"layer '$layer': unexpected tags ${extra.toSeq.sorted.mkString(", ")}"
            }
        }
      }
      ExampleResult(name, issues.toSeq)
    } catch {
      case e: Exception => ExampleResult(name, Seq(s"error: ${e.getMessage}"))
    }
  }
}
