package graft

import graft.engine.{Attrs, Render, TileAssembler, Mvt}
import graft.model._
import graft.geo.Geo
import java.util.concurrent.atomic.AtomicLong

/** Dev-only: pure-JVM render microbench (no Spark) to separate engine
  * allocation contention from Spark-layer costs. */
object RenderMicro {
  def main(args: Array[String]): Unit = {
    val nDocs = 200000
    val specs = (0 until nDocs).map { i =>
      val lon = ((i.toLong * 9973) % 36000) / 100.0 - 180.0
      val lat = ((i.toLong * 7919) % 17000) / 100.0 - 85.0
      FeatureSpec("points", Render.worldWkb(Geo.point(lon, lat)), i.toLong, i % 1000,
        0, 12, Map("text" -> s"order $i"), labelGridPixelSize = 64, labelGridLimit = 16)
    }.toArray

    for (threads <- Seq(8, 32, 8, 32)) {
      val idx = new AtomicLong(0)
      val rows = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (1 to threads).map(_ => new Thread(() => {
        var n = 0L
        var i = idx.getAndAdd(256)
        while (i < nDocs) {
          val end = math.min(i + 256, nDocs)
          var j = i.toInt
          while (j < end) {
            val it = Render.renderOne(specs(j))
            while (it.hasNext) { it.next(); n += 1 }
            j += 1
          }
          i = idx.getAndAdd(256)
        }
        rows.addAndGet(n)
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[micro] threads=$threads%2d sec=$sec%6.2f rows=${rows.get} docsPerSec=${nDocs / sec}%,.0f perThread=${nDocs / sec / threads}%,.0f")
    }
  }
}
