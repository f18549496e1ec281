package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, retry-safe sampling for training-data curation.
 *
 * `DataFrame.sample` / `stat.sampleBy` draw from a per-task RNG, so a
 * re-executed task (speculation, executor loss) can sample DIFFERENT
 * rows — at 100 TB some task always retries, and the "same" job then
 * produces different corpora run to run. Here membership is a pure
 * function of (seed, key): keep a row iff the portable 60-bit md5
 * hash of its key falls under the rate threshold. Retries, AQE
 * re-plans, and even other engines (the DuckDB oracle replays the
 * same md5 arithmetic) agree row for row. A narrow filter — no
 * shuffle, no state; rates compose per stratum via any Column
 * expression.
 */
object Sampling {

  /** Portable 60-bit key hash in [0, 2^60): first 15 hex chars of
    * md5(seed:key) — the same construction as
    * [[graft.text.Text.tokenHash60]], seeded. NULL keys hash to NULL
    * (concat propagates, unlike concat_ws which would silently skip
    * the NULL and give every un-keyed row the same fixed hash), so
    * NULL-key rows are never sampled — matching 'seed:'||key in SQL. */
  def hash60(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Keep each row with probability `rate` (a Column, so per-stratum
    * rates are just a CASE over the stratum column), deterministically
    * in (seed, key). Exact long-domain compare — no float drift. */
  def bernoulli(df: DataFrame, key: Column, rate: Column, seed: String): DataFrame =
    df.where(hash60(key, seed) < (rate * lit(1L << 60)).cast("long"))

  /** Stratified sample: per-stratum rates from a map, unknown strata
    * fall back to `defaultRate`. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], defaultRate: Double,
                 seed: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    bernoulli(df, key, rate, seed)
  }
}
