package graft

import graft.functions.{Parse, ParseImpl}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Reference-exact tag parsers — fixture tables ported from the
 * reference's `util/ParseTest.java` (testBoolean, testLong,
 * testDirection, testLength, testWayzorder) plus case-sensitivity
 * edges the reference's semantics imply.
 */
class ParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Run a string->column parser through a real Spark plan (codegen path). */
  private def run[T](inputs: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[T]] = {
    import spark.implicits._
    inputs.toDF("s").select(f(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.get(0).asInstanceOf[T])).toSeq
  }

  test("bool: blocklist semantics, case-sensitive (ParseTest.testBoolean)") {
    val cases = Seq(
      "0" -> false, "false" -> false, "no" -> false, "" -> false,
      "yes" -> true, "true" -> true, "ok" -> true,
      "No" -> true, "FALSE" -> true) // case-SENSITIVE per Imposm3Parsers
    val got = run[Boolean](cases.map(_._1), Parse.bool)
    assert(got === cases.map(c => Some(c._2)))
    // null -> false
    import spark.implicits._
    val nullRow = Seq(Option.empty[String]).toDF("s").select(Parse.bool(col("s"))).head()
    assert(nullRow.getBoolean(0) === false)
  }

  test("direction: exact forward set, no word values (ParseTest.testDirection)") {
    val cases = Seq(
      "1" -> 1, "yes" -> 1, "true" -> 1, "-1" -> -1, "2" -> 0, "0" -> 0,
      "backward" -> 0, "forward" -> 0, "YES" -> 0) // words/case not recognized
    val got = run[Int](cases.map(_._1), Parse.direction)
    assert(got === cases.map(c => Some(c._2)))
  }

  test("meters: unit grammar incl. feet'inches (ParseTest.testLength)") {
    val cases: Seq[(String, Option[Double])] = Seq(
      "1" -> Some(1), "100" -> Some(100), "-1.23 m" -> Some(-1.23),
      "100.2" -> Some(100.2), "1m" -> Some(1), "1meter" -> Some(1),
      "100 meters" -> Some(100), "1.5m" -> Some(1.5), "1km" -> Some(1000),
      "0.2km" -> Some(200), "0.2 km" -> Some(200), "1mi" -> Some(1609.344),
      "1 mi" -> Some(1609.344), "328'" -> Some(99.974), "328ft" -> Some(99.974),
      "328'11\"" -> Some(100.254), "328ft 11in" -> Some(100.254),
      "garbage" -> None, "1nmi" -> Some(1852), "1.5 nmi" -> Some(2778),
      "1..5 nmi" -> None, "36\"" -> Some(0.9144), "1'11\"" -> Some(0.584),
      "132.74'" -> Some(40.4592), "132'8.88\"" -> Some(40.4592),
      "1'11m" -> Some(0.305), "1.5 smoots" -> None)
    val got = run[Double](cases.map(_._1), Parse.meters)
    cases.zip(got).foreach { case ((in, want), actual) =>
      want match {
        case None    => assert(actual.isEmpty, s"meters($in)")
        case Some(w) => assert(actual.isDefined && math.abs(actual.get - w) < 1e-3, s"meters($in)=$actual want $w")
      }
    }
  }

  test("longOrNull: strict parse with NumberFormat retry (ParseTest.testLong)") {
    val cases: Seq[(String, Option[Long])] = Seq(
      "0" -> Some(0), "false" -> None, "123" -> Some(123),
      "123.123" -> Some(123), "-42" -> Some(-42), "1,234" -> Some(1234))
    val got = run[Long](cases.map(_._1), Parse.longOrNull)
    assert(got === cases.map(_._2))
  }

  test("wayzorder: imposm3 rank table + clamp (ParseTest.testWayzorder)") {
    import spark.implicits._
    val cases: Seq[(Map[String, String], Int)] = Seq(
      Map.empty[String, String] -> 0,
      Map("layer" -> "1") -> 10,
      Map("layer" -> "-3") -> -30,
      Map("highway" -> "motorway") -> 9,
      Map("railway" -> "anything") -> 7,
      Map("railway" -> "anything", "tunnel" -> "1") -> -3,
      Map("railway" -> "anything", "bridge" -> "1") -> 17,
      // semantics edges beyond the reference table:
      Map("highway" -> "tertiary") -> 4,
      Map("highway" -> "tertiary_link") -> 3,
      Map("highway" -> "footway") -> 0,                       // unknown class, no railway
      Map("highway" -> "footway", "railway" -> "tram") -> 7,  // railway fallback wins
      Map("highway" -> "steps", "tunnel" -> "no") -> 0,       // no steps special-case, "no" is false
      Map("layer" -> "1000", "highway" -> "motorway") -> 0,   // |z| >= 10000 -> 0
      Map("layer" -> "bogus", "highway" -> "trunk") -> 8)     // unparseable layer -> 0
    val got = cases.map(_._1).toDF("tags").select(Parse.wayzorder(col("tags"))).collect().map(_.getInt(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("ParseImpl statics match the expression path (interpreted eval)") {
    assert(math.abs(ParseImpl.meters(UTF8String.fromString("328'11\"")).doubleValue() - 100.254) < 1e-3)
    assert(ParseImpl.meters(UTF8String.fromString("garbage")) === null)
    assert(ParseImpl.parseLongOrNull(UTF8String.fromString("123.123")) === 123L)
    assert(ParseImpl.parseLongOrNull(UTF8String.fromString("x")) === null)
  }
}
