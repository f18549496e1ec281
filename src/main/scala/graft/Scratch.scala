package graft

import graft.engine._
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

// temporary instrumentation main (deleted before round end)
object Scratch {

  final class StageTimer extends SparkListener {
    case class S(name: String, submitted: Long, var completed: Long = 0,
                 var taskTimes: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
                 var detail: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty)
    val stages = mutable.LinkedHashMap[Int, S]()
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
      stages(e.stageInfo.stageId) = S(e.stageInfo.name.take(60), System.nanoTime())
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stages.get(e.stageId).foreach { s =>
        s.taskTimes += e.taskInfo.duration
        val m = e.taskMetrics
        if (m != null) s.detail += f"p${e.taskInfo.index}%-3d dur=${e.taskInfo.duration / 1000.0}%6.2f shufRd=${(m.shuffleReadMetrics.totalBytesRead) / 1e6}%8.1fMB recs=${m.shuffleReadMetrics.recordsRead}%9d cpu=${m.executorCpuTime / 1e9}%6.2f gc=${m.jvmGCTime / 1000.0}%5.2f"
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
        val sum = tt.sum / 1000.0
        println(f"STAGE $tag id=$id%-4d wall=$wall%7.2f tasks=${tt.size}%-4d medTask=${med / 1000.0}%7.2f maxTask=${mx / 1000.0}%7.2f cpuSum=$sum%8.1f  ${s.name}")
        if (tt.nonEmpty && mx > 3 * math.max(1, med))
          s.detail.foreach(d => println(s"  TASK $tag $d"))
      }
      stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val threads = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new StageTimer
    spark.sparkContext.addSparkListener(timer)

    val mz = 12
    val mult = 4
    val polys = SpatialJoin.collectPolys(
      Docs.sourceFeatures(Docs.polygonDocs(spark, sfDir)).toDF())
    val profile = new Pipeline.GraftProfile(pointMaxZoom = mz, lineMaxZoom = mz,
      polyMaxZoom = math.min(7, mz),
      pip = Some(new SpatialJoin.PolygonIndex(polys)))
    Docs.synthParallelism = 32
    val dir = Bench.prepareDocsInput(spark, sfDir, mult, 64)
    val docs = spark.read.parquet(dir)

    def run(tag: String): Unit = {
      timer.stages.clear()
      val t0 = System.nanoTime()
      val rendered = Pipeline.renderedFromDocs(docs, profile, rebalance = 0)
      val n = TileAssembler.assemble(rendered, profile, threads, gzipTiles = true)
        .select("tile_id").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCH $tag tiles=$n wall=$dt%.2f tps=${n / dt}%.0f")
      timer.dump(tag)
    }
    run(s"warmup-$threads")
    run(s"run1-$threads")
    run(s"run2-$threads")
    spark.stop()
  }
}
