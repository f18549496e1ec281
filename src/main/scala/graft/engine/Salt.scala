package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew salting for hot aggregation keys (the north-rule
 * "salting hot tiles" concern, generalized): a two-phase aggregate
 * where phase 1 groups by (key, salt) — spreading one hot key over
 * `buckets` reducers — and phase 2 merges the partials per key.
 *
 * Use when a handful of keys dominate (oceans, megacities, viral
 * documents) and AQE's skew handling cannot apply (e.g. hash
 * aggregation rather than join). The tile pipeline itself defeats its
 * two known skews structurally (canonical ocean fills, map-side
 * label-grid top-K); this operator covers profile-level aggregations
 * over skewed keys.
 *
 * Supported merge semantics: sum / count / min / max (decomposable
 * aggregates — partials merge exactly).
 *
 * Honest scope note: for these decomposable aggregates Spark's own
 * map-side partial HashAggregate already bounds a hot key's reducer
 * input to one partial row per map task, so salting buys a further
 * #mapTasks → #buckets reduction at the cost of a second (tiny,
 * partials-only) shuffle. It pays off when map-task counts are huge
 * (10^4-10^5 at planet scale) or when the partial row itself is wide
 * (high-cardinality state per group); for small jobs a direct
 * groupBy is cheaper.
 */
object Salt {

  case class Agg(kind: String, column: Column, as: String)
  def sumOf(c: Column, as: String): Agg = Agg("sum", c, as)
  def countAll(as: String): Agg = Agg("count", lit(1), as)
  def minOf(c: Column, as: String): Agg = Agg("min", c, as)
  def maxOf(c: Column, as: String): Agg = Agg("max", c, as)

  /** Two-phase salted aggregation: exact same result as a direct
    * groupBy(keys).agg(...), skew-immune.
    *
    * The salt MUST be deterministic under task re-execution: a salt
    * derived from `monotonically_increasing_id()` (or rand()) can move
    * rows between (key, salt) groups when a map task is recomputed
    * after a partial reduce fetch, losing or double-counting partials.
    * `spark_partition_id()` is stable for a given input split, and one
    * salt per map partition is exactly the spread two-phase
    * aggregation needs (each partition's rows for a hot key collapse
    * to one partial row anyway). */
  def aggregate(df: DataFrame, keys: Seq[String], aggs: Seq[Agg],
                buckets: Int = 32): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggExpr(aggs.head, phase1 = true),
        aggs.tail.map(a => aggExpr(a, phase1 = true)): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(mergeExpr(aggs.head), aggs.tail.map(mergeExpr): _*)
  }

  private def aggExpr(a: Agg, phase1: Boolean): Column = a.kind match {
    case "sum" => sum(a.column).as(a.as)
    case "count" => count(a.column).as(a.as)
    case "min" => min(a.column).as(a.as)
    case "max" => max(a.column).as(a.as)
    case other => throw new IllegalArgumentException(s"unsupported agg $other")
  }

  private def mergeExpr(a: Agg): Column = a.kind match {
    case "sum" | "count" => sum(col(a.as)).as(a.as) // counts merge by summing
    case "min" => min(col(a.as)).as(a.as)
    case "max" => max(col(a.as)).as(a.as)
    case other => throw new IllegalArgumentException(s"unsupported agg $other")
  }
}
