package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump physical plans of headline queries to check
  * pushdown / broadcast / codegen shapes. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q01_agg_pushdown", "q02_broadcast_join", "q03_shuffle_join_topn",
      "q13_pip_join", "q16_knn_bruteforce", "q23_ngram_jaccard",
      "q24_minhash_lsh", "q25_simhash", "q26_embedding_dedup", "q37_dup_clusters",
      "q67_s2_radius_join")
    interesting.foreach { q =>
      println(s"\n=== $q ===")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      // only the interesting lines
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("Broadcast") || l.contains("Exchange") ||
          l.contains("Scan parquet") || l.contains("WholeStageCodegen") ||
          l.contains("SortMergeJoin") || l.contains("HashAggregate") && l.contains("partial"))
        .take(12).foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
