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

  /** splitmix64 long mixer (public-domain finalizer) — THE one copy;
    * Ann's plane seeding delegates here so signature reproducibility
    * can never drift between the dedup and ANN families. */
  @inline private[graft] def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes — delegates to the engine's ONE copy
    * (graft.engine.Mvt.fnv1a64) so MinHash signatures and the tile
    * content-dedup key can never drift apart. */
  @inline private def fnv1a(s: UTF8String): Long =
    graft.engine.Mvt.fnv1a64(s.getBytes)

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
      val md = Md5Local.get() // per-thread instance; getInstance per ROW
                              // would do a JCA provider lookup in the hot path
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

  // ---- language-ID + quality in one JVM pass (q27 hot path) ----

  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val NonAlphaPattern = java.util.regex.Pattern.compile("[^\\p{L} ]")
  private val CjkPattern = java.util.regex.Pattern.compile("[\\u4e00-\\u9fff]")

  /** Stopword profiles in sorted-lang order (de,en,es,fr) — the same
    * map `Text.langIdFromTokens` folds over, so tie-breaks resolve to
    * the lexicographically-largest language exactly like
    * `array_max(array(struct(hits, lang)))` does. */
  private lazy val LangProfiles: Array[(UTF8String, java.util.HashSet[String])] =
    graft.text.Text.Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val s = new java.util.HashSet[String](words.size * 2)
      words.foreach(s.add)
      (UTF8String.fromString(lang), s)
    }.toArray

  private val LangZh = UTF8String.fromString("zh")
  private val LangUnd = UTF8String.fromString("und")

  /**
   * One-pass language-ID + quality-decile: tokenize once, count
   * stopword hits for all four profiles, compute the four quality
   * terms — bit-for-bit the same IEEE arithmetic (same operation
   * order) as the `Text.langIdFromTokens` / `Text.qualityScoreRaw`
   * Column formulations and the DuckDB oracle, but one JVM loop per
   * row instead of interpreted Catalyst lambdas over every token.
   * Returns struct<lang_pred: string, q_decile: long>.
   */
  case class LangQualityExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("lang_pred", StringType, nullable = false),
      StructField("q_decile", LongType, nullable = false)))
    override protected def nullSafeEval(v: Any): Any = {
      val text = v.asInstanceOf[UTF8String].toString
      val toks = WsPattern.split(text, -1)
      val profiles = LangProfiles
      val hits = new Array[Int](profiles.length)
      val distinct = new java.util.HashSet[String](toks.length * 2)
      var i = 0
      while (i < toks.length) {
        // lowercase via UTF8String so this is bit-for-bit the same as
        // the Column form's lower() — String.toLowerCase(ROOT) would
        // diverge from Spark's slow path (default-locale) on e.g. tr-TR
        val low = UTF8String.fromString(toks(i)).toLowerCase.toString
        var p = 0
        while (p < profiles.length) {
          if (profiles(p)._2.contains(low)) hits(p) += 1
          p += 1
        }
        distinct.add(toks(i))
        i += 1
      }
      // best = max hits, ties -> lexicographically-largest lang
      // (profiles are lang-sorted, so >= keeps the later lang on ties)
      var bestIdx = 0
      var p = 1
      while (p < profiles.length) {
        if (hits(p) >= hits(bestIdx)) bestIdx = p
        p += 1
      }
      val lang =
        if (CjkPattern.matcher(text).find()) LangZh
        else if (hits(bestIdx) > 0) profiles(bestIdx)._1
        else LangUnd
      // quality terms — identical expression order to qualityScoreRaw:
      // ((len*0.25 + distinct*0.25) + alpha*0.25) + wordLen*0.25
      val nTok = toks.length.toDouble
      val lenScore = math.min(nTok / 64.0, 1.0)
      val distinctRatio = distinct.size.toDouble / math.max(nTok, 1.0)
      val stripped = NonAlphaPattern.matcher(text).replaceAll("")
      val alphaLen = stripped.codePointCount(0, stripped.length).toDouble
      val textLen = text.codePointCount(0, text.length).toDouble
      val alphaRatio = (alphaLen + 1.0) / (textLen + 1.0)
      val meanWordLen = (textLen + 1.0) / math.max(nTok, 1.0)
      val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 12.0) 1.0 else 0.5
      val raw = lenScore * 0.25 + distinctRatio * 0.25 + alphaRatio * 0.25 + wordLenScore * 0.25
      val decile = math.floor(raw * 10.0).toLong
      new GenericInternalRow(Array[Any](lang, decile))
    }
    override protected def withNewChildInternal(c: Expression): LangQualityExpr = copy(child = c)
  }

  private val HexChars = "0123456789abcdef".toCharArray
  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /**
   * Portable order-sensitive fingerprint — the identical md5 chain to
   * `Text.fingerprintPortable` (seed = first token; acc =
   * md5hex(acc || '|' || tok) per subsequent token, ≡ DuckDB
   * `list_reduce(tokens, (a,b) -> md5(a || '|' || b))`) — run as one
   * JVM loop with a reused MessageDigest instead of one interpreted
   * md5(concat(...)) expression-tree eval per token.
   */
  case class Md5ChainFingerprintExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any = {
      val toks = WsPattern.split(v.asInstanceOf[UTF8String].toString, -1)
      val md = Md5Local.get()
      var acc = toks(0)
      var i = 1
      while (i < toks.length) {
        md.reset()
        md.update(acc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        md.update('|'.toByte)
        md.update(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val digest = md.digest()
        val hex = new Array[Char](32)
        var j = 0
        while (j < 16) {
          hex(j * 2) = HexChars((digest(j) >> 4) & 0xf)
          hex(j * 2 + 1) = HexChars(digest(j) & 0xf)
          j += 1
        }
        acc = new String(hex)
        i += 1
      }
      UTF8String.fromString(acc)
    }
    override protected def withNewChildInternal(c: Expression): Md5ChainFingerprintExpr = copy(child = c)
  }

  /** The engine's FNV-1a 64 content hash as a codegen'd expression
    * (the dedup key of `Mvt.fnv1a64` / reference `util/Hashing.java`,
    * oracle-able via HUGEINT arithmetic). */
  case class Fnv1a64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override protected def nullSafeEval(v: Any): Any =
      graft.engine.Mvt.fnv1a64(v.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.engine.Mvt.fnv1a64($c.getBytes())")
    override protected def withNewChildInternal(c: Expression): Fnv1a64Expr = copy(child = c)
  }

  /** MVT zigzag of a signed int (engine `Mvt.zigzag`). */
  case class ZigzagExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override protected def nullSafeEval(v: Any): Any =
      graft.engine.Mvt.zigzag(v.asInstanceOf[Int])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.engine.Mvt.zigzag($c)")
    override protected def withNewChildInternal(c: Expression): ZigzagExpr = copy(child = c)
  }

  /** Encoded byte length of the engine's unsigned varint. */
  case class VarintLenExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override protected def nullSafeEval(v: Any): Any =
      graft.engine.Mvt.varintLen(v.asInstanceOf[Long])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
      defineCodeGen(ctx, ev, c => s"graft.engine.Mvt.varintLen($c)")
    override protected def withNewChildInternal(c: Expression): VarintLenExpr = copy(child = c)
  }

  def shingles(text: Column, n: Int): Column =
    SqlBridge.col(ShinglesExpr(SqlBridge.expr(text), n))
  def simhash60(text: Column): Column =
    SqlBridge.col(Simhash60Expr(SqlBridge.expr(text)))
  def minhashSig(shingleSet: Column, k: Int): Column =
    SqlBridge.col(MinHashSigExpr(SqlBridge.expr(shingleSet), k))
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    SqlBridge.col(LshBandKeysExpr(SqlBridge.expr(sig), bands, rowsPerBand))
  def langQuality(text: Column): Column =
    SqlBridge.col(LangQualityExpr(SqlBridge.expr(text)))
  def md5ChainFingerprint(text: Column): Column =
    SqlBridge.col(Md5ChainFingerprintExpr(SqlBridge.expr(text)))
  def fnv1a64(text: Column): Column =
    SqlBridge.col(Fnv1a64Expr(SqlBridge.expr(text)))
  def zigzag32(v: Column): Column =
    SqlBridge.col(ZigzagExpr(SqlBridge.expr(v)))
  def varintLen(v: Column): Column =
    SqlBridge.col(VarintLenExpr(SqlBridge.expr(v)))
}
