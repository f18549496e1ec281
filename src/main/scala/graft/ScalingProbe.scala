package graft

/** Dev-only: scaling curve with repeats to separate variance from
  * real scaling. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ns = sys.env.getOrElse("SPARK_GRAFT_NS", "8,16,32").split(",").map(_.toInt)
    ns.foreach { n =>
      val s = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        Bench.tileJob(s, sfDir, n); s.sharedState.cacheManager.clearCache() // warmup at scale
        val times = (1 to 3).map { _ =>
          val (tiles, sec) = Bench.tileJob(s, sfDir, n)
          s.sharedState.cacheManager.clearCache()
          f"$sec%.2f"
        }
        println(s"[scale] n=$n runs=${times.mkString(",")}")
      } finally s.stop()
    }
  }
}
