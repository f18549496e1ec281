package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
 * Summation order is the same sequential left-to-right fold as both
 * the Column formulation and DuckDB's list_dot_product, so results are
 * bit-identical to the oracles.
 */
object VectorExprs {

  private def toDoubles(a: ArrayData, dt: DataType): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    dt match {
      case DoubleType => var i = 0; while (i < n) { out(i) = a.getDouble(i); i += 1 }
      case FloatType => var i = 0; while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
      case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
    }
    out
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Banded random-hyperplane signature: planes (bands·rowsPerBand of
    * them, row-major, each `dim` long) fold into one long key per band
    * = (band << rowsPerBand) | sign bits. */
  case class BandedPlaneSig(child: Expression, planes: Array[Array[Double]],
                            bands: Int, rowsPerBand: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any = {
      val vec = toDoubles(v.asInstanceOf[ArrayData], elemType(child))
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
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Sign-bit signature over literal planes (one long). */
  case class PlaneSig(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any = {
      val vec = toDoubles(v.asInstanceOf[ArrayData], elemType(child))
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
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** cosine(a, b) with the exact fold order of the Column/DuckDB form:
    * dot/(sqrt(na)*sqrt(nb)), each a sequential sum. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a0: Any, b0: Any): Any = {
      val a = toDoubles(a0.asInstanceOf[ArrayData], elemType(left))
      val b = toDoubles(b0.asInstanceOf[ArrayData], elemType(right))
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) { dot += a(i) * b(i); i += 1 }
      i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      i = 0
      while (i < b.length) { nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
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
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any = {
      val vec = toDoubles(v.asInstanceOf[ArrayData], elemType(child))
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
