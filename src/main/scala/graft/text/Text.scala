package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for the training-data pipeline, all built
 * from codegen'd `functions._` column expressions (no UDFs in the hot
 * path): tokenization, language-ID heuristic, quality scoring,
 * shingling, MinHash signatures, SimHash fingerprints, rolling-hash
 * document fingerprints.
 */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish token count: words plus split-off punctuation runs
    * (approximates a subword tokenizer's count without a vocab). */
  def tokenCountBpeIsh(text: Column): Column =
    size(filter(split(text, "(?=[^\\p{L}\\p{N}])|\\s+"), t => length(t) > 0))

  /** n-gram word shingles (n consecutive tokens joined by space). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
          i => array_join(slice(t, i + 1, lit(n)), " ")),
        s => length(s) > 0))
  }

  /**
   * MinHash signature: k minimums of seeded 64-bit hashes over the
   * shingle set. Pure column expression: xxhash64(shingle, seed).
   */
  def minhash(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleSet, s => xxhash64(s, seed))))

  /** LSH band keys: hash r consecutive signature values per band. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))

  /**
   * 64-bit SimHash over token hashes: sign-sum of each bit weighted by
   * token frequency. Column-only implementation: per bit, count tokens
   * with that bit set vs total.
   */
  def simhash(text: Column): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    val n = size(hs)
    // bit i set iff #tokens with bit set > n/2 (static 64-way unroll)
    (0 until 64).map { i =>
      when(size(filter(hs, h => h.bitwiseAND(lit(1L << i)) =!= 0)) * 2 > n, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling-hash fingerprint of the whole doc: an order-sensitive
    * hash chain (reordered content changes the fingerprint; ANSI-safe —
    * no overflowing multiply). */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))

  private val Stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"))

  /**
   * Language-ID heuristic: stopword hit-rate per language profile, plus
   * a CJK codepoint test; ties -> "und". Not a model — the n-gram
   * profile approach at its smallest.
   */
  def langId(text: Column): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /**
   * Quality score in [0,1]: blend of length, distinct-token ratio,
   * alpha ratio, and mean word length sanity — the usual cheap
   * pretraining-corpus filters.
   */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val distinctRatio = size(array_distinct(t)).cast("double") / greatest(nTok, lit(1.0))
    val alphaRatio = (length(regexp_replace(text, "[^\\p{L} ]", "")).cast("double") + 1.0) /
      (length(text).cast("double") + 1.0)
    val meanWordLen = (length(text).cast("double") + 1.0) / greatest(nTok, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    round((lenScore * 0.25 + distinctRatio * 0.25 + alphaRatio * 0.25 + wordLenScore * 0.25), 6)
  }
}
