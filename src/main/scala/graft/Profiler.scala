package graft

import graft.engine._
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times each pipeline stage in isolation. */
object Profiler {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val profile = new Pipeline.GraftProfile(pointMaxZoom = 9, lineMaxZoom = 9, polyMaxZoom = 7)
    val docs = Docs.docs(spark, sfDir).repartition(cpus)
    time("docs.count")(docs.count())
    val sf = Docs.sourceFeatures(docs)
    time("sourceFeatures.count")(sf.count())
    val specs = sf.flatMap(profile.processFeature _)
    time("specs.count")(specs.count())
    val rendered = Render.renderKv(specs, profile.layers)
    time("rendered.count")(println("rendered rows: " + rendered.count()))
    val cached = rendered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("rendered.cache")(cached.count())
    val pre = TileAssembler.partialLabelGridLimit(cached)
    time("partialLimit.count")(pre.count())
    import org.apache.spark.sql.functions.col
    val shuffled = pre.repartitionByRange(cpus, col("key"))
      .sortWithinPartitions(col("key"), col("meta"), col("value"))
    time("rangeSort.count")(shuffled.count())
    val tiles = TileAssembler.assemble(cached, profile, cpus, gzipTiles = true, persistBeforeShuffle = false)
    time("assemble(total)")(println("tiles: " + tiles.count()))
    val tilesNoGzip = TileAssembler.assemble(cached, profile, cpus, gzipTiles = false, persistBeforeShuffle = false)
    time("assemble(no gzip)")(tilesNoGzip.count())
    spark.stop()
  }
}
