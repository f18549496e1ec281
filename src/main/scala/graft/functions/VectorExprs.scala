package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/**
 * Native vector expressions for the embedding operators. The
 * `zip_with`/`aggregate` column formulations evaluate one interpreted
 * lambda per element — a 64-plane signature over 64-dim vectors costs
 * ~4k lambda invocations per row; these do the same arithmetic in one
 * JVM loop per row.
 *
 * All four expressions generate code (no CodegenFallback): a fallback
 * expression anywhere in a Project/Join ejects the WHOLE operator from
 * whole-stage codegen into the interpreted volcano path, which r6
 * measured as the dominant cost of the q26 verify stage (1.28 M
 * candidate cosines). The generated code and the interpreted
 * `nullSafeEval` both call the same static helpers below, so the two
 * paths cannot diverge.
 *
 * Summation order is the same sequential left-to-right fold as both
 * the Column formulation and DuckDB's list_dot_product, so results are
 * bit-identical to the oracles.
 */
object VectorExprs {

  // ---- static helpers shared by interpreted eval and generated code ----
  // (Scala object methods get static forwarders, so Janino can call
  // graft.functions.VectorExprs.cosine(...) directly.)

  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    if (isFloat) { var i = 0; while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 } }
    else { var i = 0; while (i < n) { out(i) = a.getDouble(i); i += 1 } }
    out
  }

  /** Allocation-free: reads ArrayData in place (the toDoubles copy
    * cost 2 x 512 B per evaluation — GC churn dominated the q26
    * verify stage). Identical fold order to the copying form. */
  def cosine(a: ArrayData, b: ArrayData, aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    val n = math.min(la, lb)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; i += 1
    }
    i = 0
    while (i < la) { val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i); na += x * x; i += 1 }
    i = 0
    while (i < lb) { val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def bandedSig(v: ArrayData, isFloat: Boolean, planes: Array[Array[Double]],
                bands: Int, rowsPerBand: Int): ArrayData = {
    val vec = toDoubles(v, isFloat)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        var dot = 0.0
        var i = 0
        val n = math.min(vec.length, p.length)
        while (i < n) { dot += vec(i) * p(i); i += 1 }
        if (dot >= 0) key |= (1L << r)
        r += 1
      }
      out(b) = (b.toLong << rowsPerBand) | key
      b += 1
    }
    new GenericArrayData(out)
  }

  def planeSigOf(v: ArrayData, isFloat: Boolean, planes: Array[Array[Double]]): Long = {
    val vec = toDoubles(v, isFloat)
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var dot = 0.0
      var i = 0
      val n = math.min(vec.length, pl.length)
      while (i < n) { dot += vec(i) * pl(i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def nearest(v: ArrayData, isFloat: Boolean, centroidIds: Array[Long],
              centroidVecs: Array[Array[Double]], take: Int): ArrayData = {
    val vec = toDoubles(v, isFloat)
    val m = centroidIds.length
    val dists = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cv = centroidVecs(c)
      var d = 0.0
      var i = 0
      val n = math.min(vec.length, cv.length)
      while (i < n) { val t = vec(i) - cv(i); d += t * t; i += 1 }
      dists(c) = d
      c += 1
    }
    val kk = math.min(take, m)
    val picked = new Array[Int](kk)
    val used = new Array[Boolean](m)
    var p = 0
    while (p < kk) {
      var best = -1
      var j = 0
      while (j < m) {
        if (!used(j) && (best < 0 || dists(j) < dists(best) ||
            (dists(j) == dists(best) && centroidIds(j) < centroidIds(best)))) best = j
        j += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new GenericArrayData(picked.map(i => centroidIds(i): Any))
  }

  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case dt => throw new IllegalArgumentException(s"unsupported element type $dt")
    }

  /** Banded random-hyperplane signature: planes (bands·rowsPerBand of
    * them, row-major, each `dim` long) fold into one long key per band
    * = (band << rowsPerBand) | sign bits. */
  case class BandedPlaneSig(child: Expression, planes: Array[Array[Double]],
                            bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      bandedSig(v.asInstanceOf[ArrayData], isFloatArr(child), planes, bands, rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val fl = isFloatArr(child)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorExprs.bandedSig($v, $fl, $planesRef, $bands, $rowsPerBand);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Sign-bit signature over literal planes (one long). */
  case class PlaneSig(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      planeSigOf(v.asInstanceOf[ArrayData], isFloatArr(child), planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val fl = isFloatArr(child)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorExprs.planeSigOf($v, $fl, $planesRef);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** cosine(a, b) with the exact fold order of the Column/DuckDB form:
    * dot/(sqrt(na)*sqrt(nb)), each a sequential sum. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a0: Any, b0: Any): Any =
      cosine(a0.asInstanceOf[ArrayData], b0.asInstanceOf[ArrayData],
        isFloatArr(left), isFloatArr(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val afl = isFloatArr(left)
      val bfl = isFloatArr(right)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorExprs.cosine($a, $b, $afl, $bfl);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  }

  /** The `take` nearest centroid ids by squared distance, ordered
    * (dist, cid) ascending — ties break on the smaller cid, matching
    * the `array_min`/`array_sort` over `struct(d, c)` Column form this
    * replaces (which evaluated cells×dim interpreted lambdas per row).
    * Squared-distance fold order is the same sequential left-to-right
    * sum as `aggregate(zip_with(...))`, so values are bit-identical. */
  case class NearestCentroids(child: Expression, centroidIds: Array[Long],
                              centroidVecs: Array[Array[Double]], take: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      nearest(v.asInstanceOf[ArrayData], isFloatArr(child), centroidIds, centroidVecs, take)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("cids", centroidIds, "long[]")
      val vecsRef = ctx.addReferenceObj("cvecs", centroidVecs, "double[][]")
      val fl = isFloatArr(child)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorExprs.nearest($v, $fl, $idsRef, $vecsRef, $take);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def bandedPlaneSig(vec: Column, planes: Array[Array[Double]], bands: Int, rows: Int): Column =
    SqlBridge.col(BandedPlaneSig(SqlBridge.expr(vec), planes, bands, rows))
  def planeSig(vec: Column, planes: Array[Array[Double]]): Column =
    SqlBridge.col(PlaneSig(SqlBridge.expr(vec), planes))
  def cosineSim(a: Column, b: Column): Column =
    SqlBridge.col(CosineSim(SqlBridge.expr(a), SqlBridge.expr(b)))
  def nearestCentroids(vec: Column, centroids: Array[(Long, Array[Double])], take: Int): Column =
    SqlBridge.col(NearestCentroids(SqlBridge.expr(vec),
      centroids.map(_._1), centroids.map(_._2), take))
}
