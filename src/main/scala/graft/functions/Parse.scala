package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Forgiving tag-value parsers (reference `util/Parse.java:35-223`,
 * `util/Imposm3Parsers.java`), as codegen'd column expressions.
 */
object Parse {

  /** "1"/"true"/"yes" -> true; "0"/"false"/"no"/null -> false. */
  def bool(c: Column): Column =
    when(lower(c).isin("1", "true", "yes"), true).otherwise(false)

  /** OSM direction: 1 forward, -1 backward ("-1"/"backward"), 0 none. */
  def direction(c: Column): Column =
    when(lower(c).isin("-1", "backward"), -1)
      .when(lower(c).isin("1", "yes", "true", "forward"), 1)
      .otherwise(0)

  /** Length with unit suffix -> meters: "5", "5 m", "5km", "3 mi",
    * "10 ft", "6'", "12\"" (null if unparseable). */
  def meters(c: Column): Column = {
    val s = trim(lower(c))
    val num = regexp_extract(s, "^([-+]?[0-9]*\\.?[0-9]+)", 1)
    val unit = trim(regexp_extract(s, "^[-+]?[0-9]*\\.?[0-9]+\\s*([a-z\"']*)$", 1))
    val v = num.cast("double")
    when(num === "", lit(null).cast("double"))
      .when(unit.isin("", "m"), v)
      .when(unit === "km", v * 1000)
      .when(unit === "mi", v * 1609.344)
      .when(unit === "ft", v * 0.3048)
      .when(unit === "'", v * 0.3048)
      .when(unit === "\"", v * 0.0254)
      .when(unit === "nmi", v * 1852)
      .otherwise(lit(null).cast("double"))
  }

  /** Integer with fallback (try_cast semantics). */
  def longOrNull(c: Column): Column = try_to_number(c, lit("999999999999999999")).cast("long")

  /**
   * imposm3-style way z-order (reference `util/Imposm3Parsers.java`):
   * rank by highway class, then tunnels below, bridges above, layer
   * shifts by 10 per level.
   */
  def wayzorder(tags: Column): Column = {
    val hw = element_at(tags, "highway")
    val rank = when(hw === "motorway", 9)
      .when(hw === "trunk", 8)
      .when(hw === "primary", 6)
      .when(hw === "secondary", 5)
      .when(hw.isin("tertiary", "tertiary_link"), 4)
      .when(hw.isNotNull, 3)
      .otherwise(0)
    val layer = coalesce(try_to_number(element_at(tags, "layer"), lit("99")).cast("int"), lit(0))
    val tunnel = when(bool(element_at(tags, "tunnel")) ||
      element_at(tags, "highway") === "steps", -1).otherwise(0)
    val bridge = when(bool(element_at(tags, "bridge")), 1).otherwise(0)
    rank + layer * 10 + tunnel * 10 + bridge * 10
  }
}
