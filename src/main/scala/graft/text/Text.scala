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

  // (The earlier xxhash64-based minhash/lshBands Column forms were
  // removed: the pipeline's real path is TextExprs.minhashSig /
  // lshBandKeys (FNV-1a + splitmix64) and mixing the two hash families
  // would silently produce disjoint buckets.)

  /** SimHash fingerprint width (bits). 60 = what fits one signed long
    * from 15 hex chars of md5, so the token hash is reproducible in any
    * engine with md5 (the DuckDB oracle mirrors it 1:1). */
  val SimhashBits = 60

  /**
   * Portable 60-bit token hash: first 15 hex chars of md5, parsed as an
   * unsigned integer. Pure column expression; identical in DuckDB as
   * `list_reduce` over hex digits (or equivalent).
   */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /**
   * 64-bit SimHash over token hashes: sign-sum of each bit weighted by
   * token frequency (legacy single-column form; the distributed
   * [[graft.dedup.Dedup.simhashPairs]] path computes the same signature
   * via explode + per-bit partial sums — one pass, map-side combined).
   */
  def simhash(text: Column): Column = {
    val hs = transform(tokens(text), t => tokenHash60(t))
    val n = size(hs)
    (0 until SimhashBits).map { i =>
      when(size(filter(hs, h => shiftright(h, i).bitwiseAND(lit(1L)) =!= 0)) * 2 > n, lit(1L << i))
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

  /** Portable order-sensitive fingerprint: md5 chain over tokens with
    * the first token as seed — byte-identical to DuckDB's
    * `list_reduce(tokens, (a, b) -> md5(a || '|' || b))`, so the gate
    * can oracle-check order sensitivity end to end. */
  def fingerprintPortable(text: Column): Column = {
    val t = tokens(text)
    aggregate(slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      try_element_at(t, lit(1)),
      (acc, tok) => md5(concat(acc, lit("|"), tok)))
  }

  private[graft] val Stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "für", "auf", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"))

  /**
   * Language-ID heuristic: stopword hit-rate per language profile, plus
   * a CJK codepoint test; zero hits -> "und", equal-hit ties break to
   * the lexicographically last language code (array_max over
   * (hits, lang) structs — deterministic, and what the q27 oracle
   * mirrors). Not a model — the n-gram profile approach at its
   * smallest.
   */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** langId over a PRE-TOKENIZED column — tokenize once, reuse across
    * every downstream heuristic (one regex pass per doc, not four). */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    val lowered = transform(toks, t => lower(t))
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(lowered, t => t.isin(words.map(lit): _*))).as("hits"),
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
  def qualityScore(text: Column): Column = qualityScoreFromTokens(text, tokens(text))

  /** Raw (un-rounded) quality score from pre-tokenized input: every
    * term is the identical IEEE double expression in Spark and DuckDB,
    * so derived buckets (floor(q*10)) are oracle-exact. */
  def qualityScoreRaw(text: Column, t: Column): Column = {
    val nTok = size(t).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val distinctRatio = size(array_distinct(t)).cast("double") / greatest(nTok, lit(1.0))
    val alphaRatio = (length(regexp_replace(text, "[^\\p{L} ]", "")).cast("double") + 1.0) /
      (length(text).cast("double") + 1.0)
    val meanWordLen = (length(text).cast("double") + 1.0) / greatest(nTok, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    lenScore * 0.25 + distinctRatio * 0.25 + alphaRatio * 0.25 + wordLenScore * 0.25
  }

  def qualityScoreFromTokens(text: Column, t: Column): Column =
    round(qualityScoreRaw(text, t), 6)

}
