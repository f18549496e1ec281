package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary instrumentation main (deleted before round end)
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"SCRATCH $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def q45parts(): Unit = {
      val s = spark
      val tree = s.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey").as("member_id"),
        expr("o_orderkey div 10").as("relation_id"))
      val cycle = s.read.parquet(s"$dir/nation.parquet").select(
        (col("n_nationkey") + 1000000L).as("member_id"),
        (pmod(col("n_nationkey") + 1, lit(25)).cast("long") + 1000000L).as("relation_id"))
      val memberships = tree.unionByName(cycle)
      val base = t("base distinct+ckpt") {
        memberships.select(col("member_id"), col("relation_id").as("ancestor_id"),
          lit(1).as("depth")).distinct().localCheckpoint(eager = true)
      }
      val n = t("count")(base.count())
      println(s"SCRATCH edges=$n")
      val edges = t("collect") {
        base.select(col("member_id").cast("long"), col("ancestor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      // localClosure is private; replicate the timing via the public API
      val closure = t("transitiveClosure(total)") {
        graft.engine.Relations.transitiveClosure(memberships, maxDepth = 30)
      }
      t("downstream agg+noop") {
        closure.select(col("member_id"), col("ancestor_id")).distinct()
          .groupBy(col("ancestor_id")).agg(count(lit(1)).as("members"))
          .orderBy(col("ancestor_id"))
          .write.mode("overwrite").format("noop").save()
      }
      println(s"SCRATCH edges collected=${edges.length}")
    }
    (1 to 2).foreach(_ => q45parts())

    // q23 reference timing (reverted shape)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    (1 to 3).foreach { i =>
      t(s"q23 #$i") {
        graft.dedup.Dedup.ngramJaccardPairsPrefix(docs, 4, 5)
          .orderBy(col("da"), col("db"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
