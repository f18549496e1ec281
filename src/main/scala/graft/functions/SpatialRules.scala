package graft.functions

import graft.geo.Geo
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Spatial predicate pushdown (reference analog: the GeoParquet reader's
 * bbox row-group filter, `ParquetInputFile.java:86-100`, SURVEY O4):
 *
 * `StContainsLonLat(polyWkbLiteral, lon, lat)` is an exact JTS test
 * that Parquet can't push. The optimizer rule rewrites every Filter
 * containing it into
 *
 *   bboxMinX <= lon AND lon <= bboxMaxX AND
 *   bboxMinY <= lat AND lat <= bboxMaxY AND <original exact test>
 *
 * The added range conjuncts are plain comparisons on scan columns, so
 * Catalyst pushes them into the parquet scan (`PushedFilters`) and
 * row groups outside the bbox never leave disk; the exact test stays
 * as the post-filter. Registered through SparkSessionExtensions.
 */
object SpatialRules {

  /** Exact point-in-polygon test: polygon WKB (usually a literal),
    * lon, lat. */
  case class StContainsLonLat(poly: Expression, lon: Expression, lat: Expression,
                              expanded: Boolean = false)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = poly
    override def second: Expression = lon
    override def third: Expression = lat
    override def dataType: DataType = BooleanType

    // prepared geometry cached per (single-threaded) expression instance
    @transient private var cachedWkb: Array[Byte] = _
    @transient private var cachedPrep: PreparedGeometry = _

    override protected def nullSafeEval(p: Any, lo: Any, la: Any): Any = {
      val wkb = p.asInstanceOf[Array[Byte]]
      if (cachedPrep == null || !java.util.Arrays.equals(wkb, cachedWkb)) {
        cachedWkb = wkb.clone()
        cachedPrep = PreparedGeometryFactory.prepare(Geo.fromWkb(wkb))
      }
      cachedPrep.covers(Geo.point(lo.asInstanceOf[Double], la.asInstanceOf[Double]))
    }
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  def st_contains_lonlat(polyWkb: Column, lon: Column, lat: Column): Column =
    SqlBridge.col(StContainsLonLat(
      SqlBridge.expr(polyWkb), SqlBridge.expr(lon), SqlBridge.expr(lat)))

  object BboxPushdownRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case Filter(cond, child) if cond.exists {
        case StContainsLonLat(Literal(_, BinaryType), _, _, false) => true
        case _ => false
      } =>
        val rewritten = cond.transform {
          case sc @ StContainsLonLat(Literal(wkb: Array[Byte], BinaryType), lon, lat, false) =>
            val env = Geo.fromWkb(wkb).getEnvelopeInternal
            And(And(
              And(GreaterThanOrEqual(lon, Literal(env.getMinX)),
                LessThanOrEqual(lon, Literal(env.getMaxX))),
              And(GreaterThanOrEqual(lat, Literal(env.getMinY)),
                LessThanOrEqual(lat, Literal(env.getMaxY)))),
              sc.copy(expanded = true)) // marked: the rule is idempotent
        }
        Filter(rewritten, child)
    }
  }

  /** SparkSessionExtensions hook:
    * `.withExtensions(new graft.functions.GraftExtensions)`. */
  def install(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BboxPushdownRule
  }
}

/**
 * The library's complete SparkSessionExtensions entry point — use
 * `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.functions.GraftExtensions`: injects the
 * spatial pushdown optimizer rule AND the full scalar function surface
 * (world_x, tile_id, st_*, cel_eval), so spark-submit users get the
 * engine's SQL dialect without touching session internals.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialRules.BboxPushdownRule)
    GeoFunctions.registrations.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        es => builder(es)))
    }
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cel_eval"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "cel_eval"),
      es => ScriptFunctions.CelEval(Seq(es(0), es(1),
        org.apache.spark.sql.catalyst.expressions.Cast(es(2),
          org.apache.spark.sql.types.LongType), es(3)))))
  }
}
