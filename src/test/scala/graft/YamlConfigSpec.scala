package graft

import graft.dsl._
import graft.geo.Geo
import graft.model.SourceFeature
import org.scalatest.funsuite.AnyFunSuite

/** YAML front end for declarative profiles (custommap dialect) + the
  * `examples:` schema validator (reference
  * `validator/BaseSchemaValidator.java:279`). */
class YamlConfigSpec extends AnyFunSuite {

  test("yaml parser: block/flow styles, anchors, merge keys, typed scalars, comments") {
    val y = Yaml.parse(
      """# top comment
        |name: test schema   # trailing comment
        |version: 1.0
        |count: 42
        |enabled: true
        |nothing: null
        |defaults: &zoomdef
        |  min_zoom: 3
        |  max_zoom: 9
        |flow: {a: 1, b: [x, 'y y', "z#z"]}
        |merged:
        |  <<: *zoomdef
        |  min_zoom: 5
        |items:
        |- plain
        |- key: v1
        |  other: v2
        |- [1, 2]
        |long_text: first part
        |  continued here
        |""".stripMargin).asMap
    assert(y("name").str == "test schema")
    assert(y("version").asScalar == 1.0)
    assert(y("count").asScalar == 42L)
    assert(y("enabled").bool)
    assert(y("nothing").asScalar == null)
    val flow = y("flow").asMap
    assert(flow("a").asScalar == 1L)
    assert(flow("b").asSeq.map(_.str) == Vector("x", "y y", "z#z"))
    val merged = y("merged").asMap
    assert(merged("min_zoom").int == 5, "explicit key wins over merge")
    assert(merged("max_zoom").int == 9, "merged key inherited")
    val items = y("items").asSeq
    assert(items(0).str == "plain")
    assert(items(1).asMap("other").str == "v2")
    assert(items(2).asSeq.map(_.asScalar) == Vector(1L, 2L))
    assert(y("long_text").str == "first part continued here")
  }

  test("boolean expressions: maps OR, __all__, __not__, __any__, tag form, source") {
    def e(s: String) = ConfigProfile.parseYamlExpr(Yaml.parse(s)).simplify
    val tags = Map("natural" -> "water", "name" -> "x")
    assert(e("natural: water").evaluate(tags, "osm"))
    assert(!e("natural: sand").evaluate(tags, "osm"))
    assert(e("natural: [sand, water]").evaluate(tags, "osm"))
    assert(e("name: __any__").evaluate(tags, "osm"))
    assert(!e("missing: __any__").evaluate(tags, "osm"))
    assert(e("{natural: sand, name: x}").evaluate(tags, "osm"), "map entries OR")
    assert(!e("__all__: {natural: sand, name: x}").evaluate(tags, "osm"), "__all__ ANDs")
    assert(e("__all__: {natural: water, name: x}").evaluate(tags, "osm"))
    assert(!e("__not__: {natural: water}").evaluate(tags, "osm"))
    assert(e("source: [osm]").evaluate(tags, "osm"))
    assert(!e("source: [shp]").evaluate(tags, "osm"))
    assert(e("tag: {key: natural, value: [water]}").evaluate(tags, "osm"))
    assert(e("tag: {key: name}").evaluate(tags, "osm"))
  }

  private val schema =
    """schema_name: graft test
      |tag_mappings:
      |  bridge: boolean
      |  layer: long
      |layers:
      |- id: water
      |  features:
      |  - geometry: polygon
      |    min_zoom: 2
      |    max_zoom: 7
      |    include_when:
      |      natural: water
      |    exclude_when:
      |      covered: "yes"
      |    attributes:
      |    - key: natural
      |    - key: bridge
      |    - key: layer
      |    - key: detail
      |      tag: name
      |      min_zoom: 6
      |    - key: kind
      |      value: lake
      |      include_when:
      |        water: lake
      |examples:
      |- name: lake kept with coerced tags
      |  input:
      |    geometry: polygon
      |    tags: {natural: water, bridge: "yes", layer: "2", water: lake, name: Garda}
      |  output:
      |  - layer: water
      |    geometry: polygon
      |    min_zoom: 2
      |    max_zoom: 7
      |    tags: {natural: water, bridge: "true", layer: "2", kind: lake, detail: Garda}
      |- name: attr gated below its min_zoom
      |  input:
      |    geometry: polygon
      |    tags: {natural: water, name: Garda}
      |  output:
      |  - layer: water
      |    at_zoom: 5
      |    tags: {detail: null}
      |- name: covered water excluded
      |  input:
      |    geometry: polygon
      |    tags: {natural: water, covered: "yes"}
      |- name: wrong geometry excluded
      |  input:
      |    geometry: point
      |    tags: {natural: water}
      |""".stripMargin

  test("compileYaml: filters, tag coercions, conditional + zoom-gated attributes") {
    val profile = ConfigProfile.compileYaml(schema)
    val poly = Geo.toWkb(Geo.fromWktOrNull("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    val out = profile.processFeature(SourceFeature("d1", "osm", poly,
      Map("natural" -> "water", "bridge" -> "yes", "layer" -> "2", "water" -> "lake"), 0L)).toSeq
    assert(out.length == 1)
    val f = out.head
    assert(f.layer == "water" && f.minzoom == 2 && f.maxzoom == 7)
    assert(f.attrs("bridge") == "true", "boolean coercion")
    assert(f.attrs("layer") == "2", "long coercion")
    assert(f.attrs("kind") == "lake", "conditional attr on")
    assert(!f.attrs.contains("detail"), "zoom-gated attr not in base")
    // no-lake polygon: conditional attr off
    val out2 = profile.processFeature(SourceFeature("d2", "osm", poly,
      Map("natural" -> "water"), 0L)).toSeq
    assert(!out2.head.attrs.contains("kind"))
    // excluded by exclude_when
    val out3 = profile.processFeature(SourceFeature("d3", "osm", poly,
      Map("natural" -> "water", "covered" -> "yes"), 0L)).toSeq
    assert(out3.isEmpty)
  }

  test("examples validator: schema's own examples all pass") {
    val result = SchemaValidator.validate(schema)
    assert(result.results.length == 4)
    assert(result.ok, result.report)
  }

  test("examples validator: wrong expectations produce named issues") {
    val bad = schema.replace("max_zoom: 7\n    tags:", "max_zoom: 8\n    tags:")
      .replace("bridge: \"true\"", "bridge: \"yes\"")
    val result = SchemaValidator.validate(bad)
    assert(!result.ok)
    val issues = result.results.head.issues.mkString("; ")
    assert(issues.contains("max_zoom"))
    assert(issues.contains("bridge"))
  }

  test("examples validator: expected-absent feature reported when produced") {
    // the modified example now EXPECTS a water feature that the
    // schema's exclude_when suppresses
    val bad = schema.replace(
      "- name: covered water excluded",
      "- name: covered water excluded\n  output: [{layer: water}]")
    val result = SchemaValidator.validate(bad)
    val covered = result.results.find(_.name == "covered water excluded").get
    assert(!covered.ok)
    assert(covered.issues.head.contains("no output feature"))
  }

  test("yaml corners: seq-item anchors, spec merge precedence, backslash escapes") {
    // anchor on a sequence item + alias to it
    val y = Yaml.parse(
      """list:
        |- &d foo
        |- *d
        |- &m
        |  k: 1
        |- *m
        |""".stripMargin).asMap
    val items = y("list").asSeq
    assert(items(0).str == "foo" && items(1).str == "foo")
    assert(items(2).asMap("k").int == 1 && items(3).asMap("k").int == 1)

    // merge-key precedence per the YAML spec: EARLIER sources win
    val m = Yaml.parse(
      """a: &a {x: 1, y: 1}
        |b: &b {x: 2, z: 2}
        |c:
        |  <<: [*a, *b]
        |  y: 9
        |""".stripMargin).asMap("c").asMap
    assert(m("x").int == 1, "earlier merge source overrides later")
    assert(m("z").int == 2)
    assert(m("y").int == 9, "explicit key wins")

    // double-quoted escapes: an escaped backslash before 'n' stays a
    // backslash + n, never a newline (single-pass unescape)
    val e = Yaml.parse("""p: "C:\\new\tend"""").asMap
    assert(e("p").str == "C:\\new\tend")
  }
}
