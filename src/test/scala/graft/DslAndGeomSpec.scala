package graft

import graft.dsl._
import graft.geo.{Geo, GeomOps, LineSplitter, RangeMap, RingAssembler}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, LineString, Polygon}
import org.scalatest.funsuite.AnyFunSuite

class DslAndGeomSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- expression DSL ----

  test("simplify: hoist, units, De Morgan, double negation") {
    val e = And(Seq(And(Seq(MatchField("a"), True)), Or(Seq(False, MatchField("b")))))
    assert(e.simplify == And(Seq(MatchField("a"), MatchField("b"))))
    assert(Not(Not(MatchField("a"))).simplify == MatchField("a"))
    assert(Not(And(Seq(MatchField("a"), MatchField("b")))).simplify ==
      Or(Seq(Not(MatchField("a")), Not(MatchField("b")))))
    assert(Not(MatchAny("f", Seq(""))).simplify == MatchField("f"))
    assert(And(Seq(MatchField("a"), False)).simplify == False)
  }

  test("partial evaluation folds known tags (partition pruning hook)") {
    val e = And(Seq(MatchAny("kind", Seq("road")), MatchField("name")))
    assert(e.partialEvaluate(Map("kind" -> "road"), Set.empty) == MatchField("name"))
    assert(e.partialEvaluate(Map("kind" -> "river"), Set.empty) == False)
    assert(e.partialEvaluate(Map("kind" -> "road", "name" -> "x"), Set.empty) == True)
    assert(e.partialEvaluate(Map.empty, Set("name")) == False)
  }

  test("interpreter and Catalyst compilation agree (incl wildcards)") {
    val e = Or(Seq(
      And(Seq(MatchAny("highway", Seq("primary", "second%")), Not(MatchField("tunnel")))),
      MatchSource(Seq("osm"))))
    val rows = Seq(
      (Map("highway" -> "primary"), "x"),
      (Map("highway" -> "secondary"), "x"),
      (Map("highway" -> "secondary", "tunnel" -> "yes"), "x"),
      (Map("highway" -> "tertiary"), "osm"),
      (Map.empty[String, String], "x"))
    val df = rows.toDF("tags", "src")
    val got = df.select(e.toColumn(col("tags"), col("src")).as("m")).collect().map(_.getBoolean(0))
    val want = rows.map { case (t, s) => e.evaluate(t, s) }
    assert(got.toSeq == want)
    assert(want == Seq(true, true, false, true, false))
  }

  test("firstMatch preserves declaration order (MultiExpression semantics)") {
    val entries = Seq(
      "water" -> MatchAny("natural", Seq("water")),
      "land" -> MatchField("natural"), // broader; must not shadow "water"
      "other" -> (True: Expr))
    val df = Seq(Map("natural" -> "water"), Map("natural" -> "wood"), Map("x" -> "1"))
      .toDF("tags")
    val got = df.select(Expr.firstMatch(entries, col("tags"), lit("s")).as("k"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("water", "land", "other"))
  }

  test("empty MatchAny/And/Or compile to their identities (no Nil.reduce crash)") {
    val df = Seq(Map("natural" -> "water")).toDF("tags")
    def evalCol(e: Expr): Boolean =
      df.select(e.toColumn(col("tags"), lit("s")).as("m")).head().getBoolean(0)
    // YAML-reachable: include_when with an empty value list
    assert(!evalCol(MatchAny("natural", Nil)))
    assert(evalCol(And(Nil)))
    assert(!evalCol(Or(Nil)))
    // Catalyst and interpreter agree on the identities
    assert(!MatchAny("natural", Nil).evaluate(Map("natural" -> "water"), "s"))
    assert(And(Nil).evaluate(Map.empty, "s"))
    assert(!Or(Nil).evaluate(Map.empty, "s"))
  }

  // ---- geometry derivations ----

  test("innermost point of a C-shaped polygon lands inside it") {
    val c = Geo.fromWkt("POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))")
      .asInstanceOf[Polygon]
    val centroidOutside = !c.contains(c.getCentroid) ||
      c.getCentroid.getX > 3 // centroid pulled toward the C opening
    val inner = GeomOps.innermostPoint(c)
    assert(c.contains(inner))
    // innermost point sits in the thick left bar, not the thin arms
    assert(inner.getX < 2.5, s"got $inner")
  }

  test("point along line + partial line with cached cumulative lengths") {
    val line = Geo.fromWkt("LINESTRING (0 0, 10 0, 10 10)").asInstanceOf[LineString]
    val mid = GeomOps.pointAlongLine(line, 0.5)
    assert(mid.getX == 10.0 && math.abs(mid.getY - 0.0) < 1e-9)
    val part = GeomOps.partialLine(line, 0.25, 0.75)
    assert(part.getLength == 10.0)
    assert(part.getCoordinates.head.equals2D(new Coordinate(5, 0)))
    assert(part.getCoordinates.last.equals2D(new Coordinate(10, 5)))
  }

  test("range map merges overlapping linear attrs into minimal spans") {
    val rm = new RangeMap[String]("def")
    rm.put(0.2, 0.6, "a")
    rm.put(0.4, 0.8, "b") // overrides the overlap
    val spans = rm.spans
    assert(spans == Seq((0.0, 0.2, "def"), (0.2, 0.4, "a"), (0.4, 0.8, "b"), (0.8, 1.0, "def")))
    // adjacent equal values coalesce
    val rm2 = new RangeMap[String]("x")
    rm2.put(0.0, 0.5, "y")
    rm2.put(0.5, 1.0, "y")
    assert(rm2.spans == Seq((0.0, 1.0, "y")))
  }

  test("spherical measures: equator degree ~111km, area of 1x1 deg") {
    val line = Geo.fromWkt("LINESTRING (0 0, 1 0)").asInstanceOf[LineString]
    val m = GeomOps.lineLengthMeters(line)
    assert(math.abs(m - 111195) < 500, s"got $m")
    val sq = Geo.rect(0, 0, 1, 1)
    val a = GeomOps.areaMeters(sq)
    assert(math.abs(a - 1.236e10) / 1.236e10 < 0.01, s"got $a")
  }

  // ---- multipolygon assembly ----

  test("ring assembly stitches reversed/unordered segments into polygon with hole") {
    val segs = Seq(
      // shell split into 3 segments, one reversed
      Array(new Coordinate(0, 0), new Coordinate(10, 0), new Coordinate(10, 10)),
      Array(new Coordinate(0, 10), new Coordinate(10, 10)), // reversed wrt ring walk
      Array(new Coordinate(0, 0), new Coordinate(0, 10)),
      // hole as two segments
      Array(new Coordinate(2, 2), new Coordinate(8, 2), new Coordinate(8, 8)),
      Array(new Coordinate(8, 8), new Coordinate(2, 8), new Coordinate(2, 2)))
    val g = RingAssembler.assemble(segs)
    assert(g.getGeometryType == "Polygon")
    val p = g.asInstanceOf[Polygon]
    assert(p.getNumInteriorRing == 1)
    assert(math.abs(p.getArea - (100 - 36)) < 1e-9)
  }

  test("ring assembly: two disjoint shells become a multipolygon") {
    val segs = Seq(
      Array(new Coordinate(0, 0), new Coordinate(1, 0), new Coordinate(1, 1),
        new Coordinate(0, 1), new Coordinate(0, 0)),
      Array(new Coordinate(5, 5), new Coordinate(6, 5), new Coordinate(6, 6),
        new Coordinate(5, 6), new Coordinate(5, 5)))
    val g = RingAssembler.assemble(segs)
    assert(g.getGeometryType == "MultiPolygon")
    assert(math.abs(g.getArea - 2.0) < 1e-9)
  }

  test("unclosable segments are reported dropped") {
    val (rings, dropped) = RingAssembler.assembleRings(Seq(
      Array(new Coordinate(0, 0), new Coordinate(1, 0)))) // dangling
    assert(rings.isEmpty && dropped == 1)
  }

  test("ring assembly is endpoint-indexed: a 100k-segment ring closes in linear time") {
    // one giant ring split into 100k two-point segments, shuffled and
    // half-reversed — a coastline-relation shape. The old pair-scan
    // was O(n^3) here (~minutes); the endpoint index finishes in <10s.
    val n = 100000
    val pts = (0 until n).map { i =>
      val a = 2 * math.Pi * i / n
      new Coordinate(math.cos(a), math.sin(a))
    }
    val rnd = new scala.util.Random(42)
    val segs = rnd.shuffle((0 until n).map { i =>
      val s = Array(pts(i), pts((i + 1) % n))
      if (rnd.nextBoolean()) s.reverse else s
    }.toVector)
    val t0 = System.nanoTime()
    val (rings, dropped) = RingAssembler.assembleRings(segs)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rings.size == 1 && dropped == 0)
    assert(rings.head.length == n + 1)
    assert(secs < 10.0, s"assembly took $secs s — endpoint index regressed?")
  }

  test("polygonize survives an invalid figure-eight ring without throwing") {
    // figure-eight: self-intersecting closed ring (invalid polygon)
    val eight = Array(
      new Coordinate(0, 0), new Coordinate(2, 2), new Coordinate(2, 0),
      new Coordinate(0, 2), new Coordinate(0, 0))
    val square = Array(
      new Coordinate(10, 10), new Coordinate(14, 10), new Coordinate(14, 14),
      new Coordinate(10, 14), new Coordinate(10, 10))
    val g = RingAssembler.polygonize(Seq(eight, square))
    assert(g != null && !g.isEmpty) // degraded, not thrown
  }
}
