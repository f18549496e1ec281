package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the text-dedup hot path. The
 * column-function (`transform`/`aggregate`) formulations of shingling
 * and MinHash are interpreted per array element — at k=64 seeds over
 * ~10^3-shingle docs that is ~10^5 boxed lambda invocations per row and
 * dominated the whole benchmark (283 s at sf0.1). These expressions do
 * the same work as one JVM loop per row: hash each shingle once, then
 * k cheap long-mix minima (the standard one-pass MinHash).
 */
object TextExprs {

  /** splitmix64 long mixer (public-domain finalizer). */
  @inline private def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes (stable content hash, no dependency on
    * Spark-internal hash classes). */
  @inline private def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = -3750763034362895579L // FNV offset basis
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 1099511628211L; i += 1 }
    h
  }

  /**
   * Distinct word n-gram shingles of a whitespace-tokenized text —
   * byte-equal to the Column formulation in `Text.shingles` (tokens =
   * split on \s+, shingle i = tokens[i..i+n) joined by space, empties
   * dropped, first-occurrence-ordered distinct).
   */
  case class ShinglesExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[UTF8String].toString.split("\\s+", -1)
      val upper = math.max(toks.length - n, 0)
      val seen = new java.util.LinkedHashSet[String]((upper + 1) * 2)
      var i = 0
      while (i <= upper) {
        val end = math.min(i + n, toks.length)
        val sb = new java.lang.StringBuilder(32)
        var j = i
        while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
        if (sb.length() > 0) seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): ShinglesExpr = copy(child = c)
  }

  /**
   * One-pass MinHash signature: hash every shingle once (FNV-1a 64),
   * then per seed i keep min(mix(h + i*GOLDEN)) — O(|set| · k) long
   * arithmetic, zero allocation beyond the output array.
   */
  case class MinHashSigExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < m) {
        val h = fnv1a(arr.getUTF8String(i))
        var s = 0
        while (s < k) {
          val v2 = mix64(h + s * 0xC2B2AE3D27D4EB4FL)
          if (v2 < mins(s)) mins(s) = v2
          s += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  }

  /** LSH band keys from a minhash signature: mix r consecutive lanes
    * per band, salt with the band index (one long per band). */
  case class LshBandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(v: Any): Any = {
      val sig = v.asInstanceOf[ArrayData]
      val out = new Array[Any](bands)
      var b = 0
      while (b < bands) {
        var h = mix64(b.toLong)
        var r = 0
        while (r < rowsPerBand) {
          h = mix64(h ^ sig.getLong(b * rowsPerBand + r))
          r += 1
        }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): LshBandKeysExpr = copy(child = c)
  }

  /**
   * Full 60-bit SimHash of a text in ONE pass per row: whitespace
   * tokenize, md5 each token (first 15 hex chars = the portable 60-bit
   * hash, identical to `Text.tokenHash60` and the DuckDB oracle), count
   * per-bit majorities. Replaces an explode + 61-aggregate groupBy —
   * no shuffle, one MessageDigest per partition-task invocation.
   */
  case class Simhash60Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any = {
      val toks = v.asInstanceOf[UTF8String].toString.split("\\s+", -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](60)
      var n = 0
      toks.foreach { t =>
        md.reset()
        val digest = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = top 7.5 bytes, big-endian hex order
        var h = 0L
        var i = 0
        while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
        h = (h << 4) | ((digest(7) >> 4) & 0xfL)
        var b = 0
        while (b < 60) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        n += 1
      }
      var sig = 0L
      var b = 0
      while (b < 60) { if (counts(b) * 2 > n) sig |= (1L << b); b += 1 }
      sig
    }
    override protected def withNewChildInternal(c: Expression): Simhash60Expr = copy(child = c)
  }

  def shingles(text: Column, n: Int): Column =
    SqlBridge.col(ShinglesExpr(SqlBridge.expr(text), n))
  def simhash60(text: Column): Column =
    SqlBridge.col(Simhash60Expr(SqlBridge.expr(text)))
  def minhashSig(shingleSet: Column, k: Int): Column =
    SqlBridge.col(MinHashSigExpr(SqlBridge.expr(shingleSet), k))
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    SqlBridge.col(LshBandKeysExpr(SqlBridge.expr(sig), bands, rowsPerBand))
}
