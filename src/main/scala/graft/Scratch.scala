package graft

import graft.engine._
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

// temporary instrumentation main (deleted before round end)
object Scratch {

  final class StageTimer extends SparkListener {
    case class S(name: String, submitted: Long, var completed: Long = 0,
                 var taskTimes: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
                 var gcTimes: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
                 var cpuTimes: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
                 var detail: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty)
    val stages = mutable.LinkedHashMap[Int, S]()
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
      stages(e.stageInfo.stageId) = S(e.stageInfo.name.take(60), System.nanoTime())
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stages.get(e.stageId).foreach { s =>
        s.taskTimes += e.taskInfo.duration
        if (e.taskMetrics != null) {
          s.gcTimes += e.taskMetrics.jvmGCTime
          s.cpuTimes += e.taskMetrics.executorCpuTime
        }
        val m = e.taskMetrics
        if (m != null) s.detail += f"p${e.taskInfo.index}%-3d dur=${e.taskInfo.duration / 1000.0}%6.2f shufRd=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB recs=${m.shuffleReadMetrics.recordsRead}%9d cpu=${m.executorCpuTime / 1e9}%6.2f gc=${m.jvmGCTime / 1000.0}%5.2f"
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      stages.get(e.stageInfo.stageId).foreach(_.completed = System.nanoTime())
    }
    def dump(tag: String): Unit = synchronized {
      stages.foreach { case (id, s) =>
        val wall = (s.completed - s.submitted) / 1e9
        val tt = s.taskTimes.sorted
        val med = if (tt.isEmpty) 0L else tt(tt.size / 2)
        val mx = if (tt.isEmpty) 0L else tt.last
        println(f"STAGE $tag id=$id%-4d wall=$wall%7.2f tasks=${tt.size}%-4d medTask=${med / 1000.0}%7.2f maxTask=${mx / 1000.0}%7.2f durSum=${tt.sum / 1000.0}%8.1f cpuSum=${s.cpuTimes.sum / 1e9}%8.1f gcSum=${s.gcTimes.sum / 1000.0}%7.1f  ${s.name}")
        if (tt.nonEmpty && mx > 3 * math.max(1000, med))
          s.detail.sortBy(_.drop(1).takeWhile(_.isDigit).toInt).foreach(d => println(s"  TASK $tag $d"))
      }
      stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val qname = if (args.nonEmpty) args(0) else "q68_s2_nearest_join"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new StageTimer
    spark.sparkContext.addSparkListener(timer)
    Docs.fixtureDir = Some(s"/dev/shm/graft-fixtures/sf0.1")
    Docs.docsTable(spark, sfDir).count()
    Docs.pointFeatures(spark, sfDir).count()
    Docs.lineFeatures(spark, sfDir).count()
    val fn = SparkEntry.queries(qname)
    def run(tag: String): Unit = {
      timer.stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $tag wall=$dt%.2f")
      timer.dump(tag)
    }
    run("warmup")
    run("run1")
    run("run2")
    spark.stop()
  }
}
