package graft.functions

import graft.geo.{Geo, GeomOps, Hilbert, Mercator, S2, Simplify, TileCoord}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.locationtech.jts.geom.LineString

/**
 * The engine's scalar function surface as native Catalyst expressions.
 * The hot projection math (world_x/world_y/tile ids/hilbert) implements
 * `doGenCode`, so it inlines into whole-stage codegen exactly like a
 * built-in (no UDF boxing); geometry ops over WKB wrap JTS behind
 * `CodegenFallback` (still expression-level: null handling + columnar
 * inputs, no ScalaUDF closure overhead).
 *
 * `register` exposes everything to SQL (`SELECT world_x(lon) ...`).
 */
object GeoFunctions {

  case class WorldX(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(v: Any): Any =
      Mercator.worldX(v.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.geo.Mercator.worldX($c)")
    override protected def withNewChildInternal(c: Expression): WorldX = copy(c)
  }

  case class WorldY(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(v: Any): Any =
      Mercator.worldY(v.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.geo.Mercator.worldY($c)")
    override protected def withNewChildInternal(c: Expression): WorldY = copy(c)
  }

  /** Hilbert-ordered tile id of a lon/lat point at a zoom. */
  case class TileIdExpr(lon: Expression, lat: Expression, zoom: Expression)
      extends TernaryExpression {
    override def first: Expression = lon
    override def second: Expression = lat
    override def third: Expression = zoom
    override def dataType: DataType = LongType
    override protected def nullSafeEval(lo: Any, la: Any, z: Any): Any =
      TileCoord.hilbertIdOf(lo.asInstanceOf[Double], la.asInstanceOf[Double], z.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"graft.geo.TileCoord.hilbertIdOf($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  case class HilbertIndex(order: Expression, x: Expression, y: Expression)
      extends TernaryExpression {
    override def first: Expression = order
    override def second: Expression = x
    override def third: Expression = y
    override def dataType: DataType = LongType
    override protected def nullSafeEval(o: Any, xv: Any, yv: Any): Any =
      Hilbert.xyToIndex(o.asInstanceOf[Int], xv.asInstanceOf[Int], yv.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"graft.geo.Hilbert.xyToIndex($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  /** Haversine meters between two lon/lat points (QuaternaryExpression
    * gives null-safe codegen for free). */
  case class MetersBetween(children: Seq[Expression]) extends Expression
      with CodegenFallback {
    require(children.length == 4,
      s"meters_between(lon0, lat0, lon1, lat1) takes 4 arguments, got ${children.length}")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = children.exists(_.nullable)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else Mercator.metersBetween(
        vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
        vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double])
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
  }

  /** DP-simplify a WKB geometry (tolerance in input units). */
  case class SimplifyDp(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(wkb: Any, tol: Any): Any = {
      val g = Geo.fromWkb(wkb.asInstanceOf[Array[Byte]])
      Geo.toWkb(Simplify.dp(g, tol.asInstanceOf[Double]))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** S2 cell id of a lon/lat point at a level — the spherical index
    * (geo/S2.scala); codegen'd like the mercator tile ids. */
  case class S2CellIdExpr(lon: Expression, lat: Expression, level: Expression)
      extends TernaryExpression {
    override def first: Expression = lon
    override def second: Expression = lat
    override def third: Expression = level
    override def dataType: DataType = LongType
    override protected def nullSafeEval(lo: Any, la: Any, l: Any): Any =
      S2.cellId(lo.asInstanceOf[Double], la.asInstanceOf[Double], l.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) => s"graft.geo.S2.cellId($a, $b, $c)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
  }

  /** Hex token of an S2 cell id (the library's compact string form). */
  case class S2TokenExpr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(S2.token(v.asInstanceOf[Long]))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class S2ParentExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(id: Any, lvl: Any): Any =
      S2.parent(id.asInstanceOf[Long], lvl.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.geo.S2.parent($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** True iff cell `left` contains cell `right` (unsigned range test). */
  case class S2ContainsExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      S2.contains(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.geo.S2.contains($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** Superset S2 covering of a spherical cap, as array<long> — the
    * bucketing generator for the pole-safe radius join. */
  case class S2CapCoverExpr(lon: Expression, lat: Expression, radius: Expression,
                            level: Expression)
      extends QuaternaryExpression with CodegenFallback {
    override def first: Expression = lon
    override def second: Expression = lat
    override def third: Expression = radius
    override def fourth: Expression = level
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(lo: Any, la: Any, r: Any, l: Any): Any =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        S2.capCover(lo.asInstanceOf[Double], la.asInstanceOf[Double],
          r.asInstanceOf[Double], l.asInstanceOf[Int]))
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression, e: Expression) = copy(a, b, c, e)
  }

  /** st_* style geometry ops over WKB, one expression each. */
  abstract class WkbUnary extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
  }

  case class StCentroid(child: Expression) extends WkbUnary {
    override protected def nullSafeEval(wkb: Any): Any =
      Geo.toWkb(GeomOps.centroid(Geo.fromWkb(wkb.asInstanceOf[Array[Byte]])))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StPointOnSurface(child: Expression) extends WkbUnary {
    override protected def nullSafeEval(wkb: Any): Any =
      Geo.toWkb(GeomOps.pointOnSurface(Geo.fromWkb(wkb.asInstanceOf[Array[Byte]])))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StInnermostPoint(child: Expression) extends WkbUnary {
    override protected def nullSafeEval(wkb: Any): Any =
      Geo.toWkb(GeomOps.innermostPoint(Geo.fromWkb(wkb.asInstanceOf[Array[Byte]])))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StLineInterpolate(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(wkb: Any, ratio: Any): Any =
      Geo.fromWkb(wkb.asInstanceOf[Array[Byte]]) match {
        case l: LineString => Geo.toWkb(GeomOps.pointAlongLine(l, ratio.asInstanceOf[Double]))
        case other => Geo.toWkb(other.getCentroid)
      }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }
  case class StAreaMeters(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(wkb: Any): Any =
      GeomOps.areaMeters(Geo.fromWkb(wkb.asInstanceOf[Array[Byte]]))
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  case class StLengthMeters(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(wkb: Any): Any =
      Geo.fromWkb(wkb.asInstanceOf[Array[Byte]]) match {
        case l: LineString => GeomOps.lineLengthMeters(l)
        case m: org.locationtech.jts.geom.MultiLineString =>
          // sum of parts — a merged road as MultiLineString must not
          // silently measure 0
          (0 until m.getNumGeometries).map(i =>
            GeomOps.lineLengthMeters(m.getGeometryN(i).asInstanceOf[LineString])).sum
        case _ => 0.0
      }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
  /** snapAndFixPolygon at a given precision scale (units per coord). */
  case class StSnapFixPolygon(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true // null on unfixable input
    override protected def nullSafeEval(wkb: Any, scale: Any): Any = {
      val g = Geo.fromWkb(wkb.asInstanceOf[Array[Byte]])
      try Geo.toWkb(graft.geo.PolygonFixer.snapAndFix(g,
        new org.locationtech.jts.geom.PrecisionModel(scale.asInstanceOf[Double])))
      catch { case _: Exception => null }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** EPSG:3857 meters -> lon degrees (closed form, codegen'd). */
  case class MercToLon(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(v: Any): Any =
      graft.geo.Crs.mercatorToLon(v.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.geo.Crs.mercatorToLon($c)")
    override protected def withNewChildInternal(c: Expression): MercToLon = copy(c)
  }

  /** EPSG:3857 meters -> lat degrees (closed form, codegen'd). */
  case class MercToLat(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(v: Any): Any =
      graft.geo.Crs.mercatorToLat(v.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.geo.Crs.mercatorToLat($c)")
    override protected def withNewChildInternal(c: Expression): MercToLat = copy(c)
  }

  case class StGeomFromText(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    // returns null on unparseable WKT even for a non-null child — the
    // default child-derived nullable would let codegen hardwire isNull
    // to false and NPE downstream
    override def nullable: Boolean = true
    override protected def nullSafeEval(wkt: Any): Any = {
      val g = Geo.fromWktOrNull(wkt.toString)
      if (g == null) null else Geo.toWkb(g)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  // construction-time casts (AbstractDataType/ImplicitCastInputTypes are
  // private[sql] in Spark 4, so coerce children explicitly)
  private def d(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  private def i(e: Expression): Expression =
    if (e.dataType == IntegerType) e else Cast(e, IntegerType)
  private def l(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  // Column wrappers
  def world_x(lon: Column): Column = SqlBridge.col(WorldX(d(SqlBridge.expr(lon))))
  def world_y(lat: Column): Column = SqlBridge.col(WorldY(d(SqlBridge.expr(lat))))
  def tile_id(lon: Column, lat: Column, zoom: Column): Column =
    SqlBridge.col(TileIdExpr(d(SqlBridge.expr(lon)), d(SqlBridge.expr(lat)), i(SqlBridge.expr(zoom))))
  def hilbert_index(order: Column, x: Column, y: Column): Column =
    SqlBridge.col(HilbertIndex(i(SqlBridge.expr(order)), i(SqlBridge.expr(x)), i(SqlBridge.expr(y))))
  def meters_between(lon0: Column, lat0: Column, lon1: Column, lat1: Column): Column =
    SqlBridge.col(MetersBetween(Seq(lon0, lat0, lon1, lat1).map(c => d(SqlBridge.expr(c)))))
  def simplify_dp(wkb: Column, tol: Column): Column = SqlBridge.col(SimplifyDp(SqlBridge.expr(wkb), d(SqlBridge.expr(tol))))
  def st_geomfromtext(wkt: Column): Column = SqlBridge.col(StGeomFromText(SqlBridge.expr(wkt)))
  def st_centroid(wkb: Column): Column = SqlBridge.col(StCentroid(SqlBridge.expr(wkb)))
  def st_point_on_surface(wkb: Column): Column = SqlBridge.col(StPointOnSurface(SqlBridge.expr(wkb)))
  def st_innermost_point(wkb: Column): Column = SqlBridge.col(StInnermostPoint(SqlBridge.expr(wkb)))
  def st_line_interpolate(wkb: Column, ratio: Column): Column =
    SqlBridge.col(StLineInterpolate(SqlBridge.expr(wkb), d(SqlBridge.expr(ratio))))
  def st_area_meters(wkb: Column): Column = SqlBridge.col(StAreaMeters(SqlBridge.expr(wkb)))
  def st_snap_fix_polygon(wkb: Column, scale: Column): Column =
    SqlBridge.col(StSnapFixPolygon(SqlBridge.expr(wkb), d(SqlBridge.expr(scale))))
  def st_length_meters(wkb: Column): Column = SqlBridge.col(StLengthMeters(SqlBridge.expr(wkb)))
  def merc_to_lon(x: Column): Column = SqlBridge.col(MercToLon(d(SqlBridge.expr(x))))
  def merc_to_lat(y: Column): Column = SqlBridge.col(MercToLat(d(SqlBridge.expr(y))))
  def s2_cell_id(lon: Column, lat: Column, level: Column): Column =
    SqlBridge.col(S2CellIdExpr(d(SqlBridge.expr(lon)), d(SqlBridge.expr(lat)), i(SqlBridge.expr(level))))
  def s2_token(id: Column): Column = SqlBridge.col(S2TokenExpr(l(SqlBridge.expr(id))))
  def s2_parent(id: Column, level: Column): Column =
    SqlBridge.col(S2ParentExpr(l(SqlBridge.expr(id)), i(SqlBridge.expr(level))))
  def s2_contains(a: Column, b: Column): Column =
    SqlBridge.col(S2ContainsExpr(l(SqlBridge.expr(a)), l(SqlBridge.expr(b))))
  def s2_cap_cover(lon: Column, lat: Column, radiusMeters: Column, level: Column): Column =
    SqlBridge.col(S2CapCoverExpr(d(SqlBridge.expr(lon)), d(SqlBridge.expr(lat)),
      d(SqlBridge.expr(radiusMeters)), i(SqlBridge.expr(level))))

  /** Name -> expression builder for every SQL-registered function (one
    * source of truth for both `register` and `GraftExtensions`). */
  def registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "world_x" -> (es => WorldX(d(es.head))),
    "world_y" -> (es => WorldY(d(es.head))),
    "tile_id" -> (es => TileIdExpr(d(es(0)), d(es(1)), i(es(2)))),
    "hilbert_index" -> (es => HilbertIndex(i(es(0)), i(es(1)), i(es(2)))),
    "meters_between" -> (es => MetersBetween(es.map(d))),
    "simplify_dp" -> (es => SimplifyDp(es(0), d(es(1)))),
    "st_geomfromtext" -> (es => StGeomFromText(es.head)),
    "st_centroid" -> (es => StCentroid(es.head)),
    "st_point_on_surface" -> (es => StPointOnSurface(es.head)),
    "st_innermost_point" -> (es => StInnermostPoint(es.head)),
    "st_line_interpolate" -> (es => StLineInterpolate(es(0), d(es(1)))),
    "st_area_meters" -> (es => StAreaMeters(es.head)),
    "st_snap_fix_polygon" -> (es => StSnapFixPolygon(es(0), d(es(1)))),
    "st_length_meters" -> (es => StLengthMeters(es.head)),
    "merc_to_lon" -> (es => MercToLon(d(es.head))),
    "merc_to_lat" -> (es => MercToLat(d(es.head))),
    "s2_cell_id" -> (es => S2CellIdExpr(d(es(0)), d(es(1)), i(es(2)))),
    "s2_token" -> (es => S2TokenExpr(l(es.head))),
    "s2_parent" -> (es => S2ParentExpr(l(es(0)), i(es(1)))),
    "s2_contains" -> (es => S2ContainsExpr(l(es(0)), l(es(1)))),
    "s2_cap_cover" -> (es => S2CapCoverExpr(d(es(0)), d(es(1)), d(es(2)), i(es(3)))))

  /** Register all functions for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, es => b(es), "built-in")
    }
  }
}
