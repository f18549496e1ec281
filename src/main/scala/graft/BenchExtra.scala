package graft

import graft.engine.Docs
import org.apache.spark.sql.SparkSession

/**
 * Extra per-query measurement harness (guide §1.4): times individual
 * declared queries with the noop sink, isolated from the frozen
 * driver bench, and optionally dumps `.explain("formatted")` plans.
 *
 * Usage:
 *   sbt "runMain graft.BenchExtra q45_relation_closure,q23_ngram_jaccard"
 *   SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=before \
 *     sbt "runMain graft.BenchExtra q45_relation_closure"
 *
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 2).
 * Not part of the frozen driver contract — numbers quoted from here
 * are labeled as BenchExtra in OPTIMIZATION_r06.md.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same fixture materialization as the frozen bench so the timed
    // region matches what the driver measures
    Docs.fixtureDir = Some(s"/dev/shm/graft-fixtures/${new java.io.File(sfDir).getName}")
    Docs.docsTable(spark, sfDir).count()
    Docs.pointFeatures(spark, sfDir).count()
    Docs.lineFeatures(spark, sfDir).count()

    val results = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      plansDir.foreach { pd =>
        val f = new java.io.File(pd)
        f.mkdirs()
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$pd/${name}_$planSuffix.txt")
        try w.println(plan) finally w.close()
      }
      val times = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch {
          case e: Throwable =>
            // loud, unlike the frozen bench's silent fallback (guide §1)
            println(s"EXTRA_ERR $name: ${e.getClass.getName}: ${e.getMessage}")
            e.printStackTrace()
        }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      results += (name -> times)
      println(f"EXTRA $name%-28s min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    println("EXTRA_SUMMARY " + results.map { case (k, v) => s"$k=${f"${v.min}%.3f"}" }.mkString(" "))
    spark.stop()
  }
}
