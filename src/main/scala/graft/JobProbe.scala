package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-only: per-job wall time + task-time sums to locate serial cost. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val jobStart = mutable.Map[Int, Long]()
    val taskSum = mutable.Map[Int, Long]()
    val taskMax = mutable.Map[Int, Long]()
    val taskCount = mutable.Map[Int, Int]()
    val stageToJob = mutable.Map[Int, Int]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart(e.jobId) = System.nanoTime()
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.getOrElse(e.stageId, -1)
        val d = e.taskInfo.duration
        taskSum(j) = taskSum.getOrElse(j, 0L) + d
        taskMax(j) = math.max(taskMax.getOrElse(j, 0L), d)
        taskCount(j) = taskCount.getOrElse(j, 0) + 1
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val wall = (System.nanoTime() - jobStart(e.jobId)) / 1e6
        println(f"[job] id=${e.jobId}%3d wall=${wall}%8.0fms taskSum=${taskSum.getOrElse(e.jobId, 0L)}%8dms taskMax=${taskMax.getOrElse(e.jobId, 0L)}%7dms tasks=${taskCount.getOrElse(e.jobId, 0)}%5d")
      }
    })

    // match the scaling harness's workload when SPARK_GRAFT_SCALECFG=1:
    // pre-split docs input, x4 corpus, z0-12, no persist
    val scaleCfg = sys.env.get("SPARK_GRAFT_SCALECFG").contains("1")
    def run() =
      if (scaleCfg) Bench.tileJob(s, sfDir, n, maxZoom = 12, preSplit = true,
        multiplier = 4, persistDefault = false)
      else Bench.tileJob(s, sfDir, n)
    run() // warmup
    s.sharedState.cacheManager.clearCache()
    println("[job] ---- timed run ----")
    import scala.jdk.CollectionConverters._
    def gcStats(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    val (gc0, gct0) = gcStats()
    val t0 = System.nanoTime()
    val (tiles, sec) = run()
    val (gc1, gct1) = gcStats()
    println(f"[job] TOTAL $sec%.2f s, $tiles tiles, gcCount=${gc1 - gc0} gcTime=${(gct1 - gct0) / 1000.0}%.1f s")
    Thread.sleep(500)
    s.stop()
  }
}
