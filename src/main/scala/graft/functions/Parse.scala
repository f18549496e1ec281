package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Forgiving tag-value parsers with reference-exact semantics
 * (reference `util/Parse.java:35-223`, `util/Imposm3Parsers.java`,
 * itself ported from imposm3 `mapping/columns.go`):
 *
 *  - `bool` is a BLOCKLIST, not an allowlist: anything except
 *    null/""/"0"/"false"/"no" is true ("ok" -> true), case-SENSITIVE
 *    ("No" -> true) — `Imposm3Parsers.bool`.
 *  - `direction` forward set is exactly {"1","yes","true"}, backward
 *    is exactly "-1" (no "forward"/"backward" words, case-sensitive)
 *    — `Imposm3Parsers.direction`.
 *  - `meters` scans (find, not anchored-match) for the first
 *    number+unit token, supports m/km/"kilom"/mi/ft/'/in/"/nmi and the
 *    feet-then-inches combination (328'11"), bare number = meters
 *    — `Parse.meters` / `Parse.DISTANCE`.
 *  - `wayzorder` uses the imposm3 rank table (tertiary=4 but
 *    tertiary_link=3, railway fallback 7, unknown highway 0), shifts
 *    ±10 for tunnel/bridge and 10/layer, and zeroes |z| >= 10000
 *    — `Imposm3Parsers.wayzorder`.
 *
 * Scalar parses are native codegen'd expressions over a static JVM
 * impl ([[ParseImpl]]); the set-membership ones are plain built-in
 * column compositions.
 */
object Parse {

  /** Reference `Imposm3Parsers.bool`: false iff null/""/"0"/"false"/"no". */
  def bool(c: Column): Column =
    when(c.isNull, false).otherwise(!c.isin("", "0", "false", "no"))

  /** 1 if [[bool]], else 0 (`Imposm3Parsers.boolInt`). */
  def boolInt(c: Column): Column = when(bool(c), 1).otherwise(0)

  /** Reference `Imposm3Parsers.direction`: 1 for {"1","yes","true"},
    * -1 for "-1", else (incl. null) 0. */
  def direction(c: Column): Column =
    when(c.isin("1", "yes", "true"), 1)
      .when(c === "-1", -1)
      .otherwise(0)

  /** Length with unit -> meters (`Parse.meters`, OSM Map_features/Units):
    * "5", "5 m", "5km", "3 mi", "328'11\"", "1.5 nmi"; null if unparseable. */
  def meters(c: Column): Column =
    SqlBridge.col(MetersExpr(SqlBridge.expr(c.cast("string"))))

  /** Reference `Parse.parseLongOrNull`: Long.parseLong with a
    * NumberFormat retry ("123.123" -> 123, "1,234" -> 1234). */
  def longOrNull(c: Column): Column =
    SqlBridge.col(ParseLongExpr(SqlBridge.expr(c.cast("string"))))

  /** `parseLongOrNull` with the reference's 0 fallback (`Parse.parseLong`). */
  def long(c: Column): Column = coalesce(longOrNull(c), lit(0L))

  /**
   * imposm3-style way z-order over an OSM tag map
   * (`Imposm3Parsers.wayzorder`): layer*10 + highway rank (railway
   * fallback 7) - 10 if tunnel + 10 if bridge; 0 if |z| >= 10000.
   */
  def wayzorder(tags: Column): Column = {
    val hw = element_at(tags, "highway")
    val rank = when(hw === "motorway", 9L)
      .when(hw === "trunk", 8L)
      .when(hw === "primary", 6L)
      .when(hw === "secondary", 5L)
      .when(hw === "tertiary", 4L)
      .when(hw.isin("minor", "road", "unclassified", "residential", "tertiary_link",
        "secondary_link", "primary_link", "trunk_link", "motorway_link"), 3L)
      .otherwise(when(map_contains_key(tags, "railway"), 7L).otherwise(0L))
    val layer = long(element_at(tags, "layer"))
    val z = layer * 10 + rank +
      boolInt(element_at(tags, "tunnel")).cast("long") * -10L +
      boolInt(element_at(tags, "bridge")).cast("long") * 10L
    when(abs(z) < 10000, z).otherwise(0L).cast("int")
  }

  /** `Parse.meters` as a native unary expression (string -> nullable double). */
  case class MetersExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      ParseImpl.meters(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double ${ev.value}_r = graft.functions.ParseImpl.meters($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """)
    override protected def withNewChildInternal(c: Expression): MetersExpr = copy(c)
  }

  /** `Parse.parseLongOrNull` as a native unary expression (string -> nullable long). */
  case class ParseLongExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      ParseImpl.parseLongOrNull(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Long ${ev.value}_r = graft.functions.ParseImpl.parseLongOrNull($c);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.longValue(); }
      """)
    override protected def withNewChildInternal(c: Expression): ParseLongExpr = copy(c)
  }
}

/** Static JVM impls called from both interpreted eval and generated code. */
object ParseImpl {

  // Reference `Parse.DISTANCE` (util/Parse.java:18-22) — the published
  // OSM unit grammar; group order matters only for docs, named groups
  // are mutually exclusive per match.
  private val Distance = java.util.regex.Pattern.compile(
    "(?<value>-?[\\d.]+)\\s*((?<mi>mi)|(?<m>m|$)|(?<km>km|kilom)|(?<ft>ft|')|(?<in>in|\")|" +
      "(?<nmi>nmi|international nautical mile|nautical))",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private val Nf = new ThreadLocal[java.text.NumberFormat] {
    override def initialValue(): java.text.NumberFormat =
      java.text.NumberFormat.getNumberInstance(java.util.Locale.ROOT)
  }

  /** Reference `Parse.meters` (util/Parse.java:169-208) incl. the
    * feet-then-inches second find (`328'11"` -> 100.254 m). */
  def meters(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val m = Distance.matcher(s.toString)
    if (!m.find()) return null
    try {
      var value = java.lang.Double.parseDouble(m.group("value"))
      if (m.group("m") != null) ()
      else if (m.group("km") != null) value *= 1000d
      else if (m.group("mi") != null) value *= 1609.344
      else if (m.group("nmi") != null) value *= 1852d
      else if (m.group("ft") != null) {
        value *= 12 * 0.0254
        if (m.find() && m.group("in") != null) {
          value += java.lang.Double.parseDouble(m.group("value")) * 0.0254
        }
      } else if (m.group("in") != null) value *= 0.0254
      else return null
      java.lang.Double.valueOf(value)
    } catch { case _: NumberFormatException => null }
  }

  /** Reference `Parse.parseLongOrNull(String)` (util/Parse.java:49-55):
    * strict parse, then the Locale.ROOT NumberFormat retry. */
  def parseLongOrNull(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    try java.lang.Long.valueOf(java.lang.Long.parseLong(str))
    catch {
      case _: NumberFormatException =>
        try java.lang.Long.valueOf(Nf.get().parse(str).longValue())
        catch { case _: java.text.ParseException => null }
    }
  }
}
