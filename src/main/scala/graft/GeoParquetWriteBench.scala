package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the GeoParquet writer: 10^6 WKB point rows,
  * prints rows/sec (best of 3). */
object GeoParquetWriteBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("GPQ_PARTS", "8")}]")
      .appName("gpq-write-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GeoFunctions.st_geomfromtext
    val n = 1000000
    // wide-ish schema: geometry + 16 attr columns, the shape where
    // per-row field dispatch cost shows
    val wide = (0 until 16).map(i =>
      concat(lit(s"attr$i="), (col("id") % (13 + i)).cast("string")).as(s"attr$i"))
    val df = spark.range(n.toLong).select(Seq(col("id"),
        st_geomfromtext(concat(lit("POINT ("),
          (col("id") % 360 - 180).cast("double") / 2.0, lit(" "),
          (col("id") % 170 - 85).cast("double") / 2.0, lit(")"))).as("geometry"),
        (col("id") % 97).cast("int").as("attr")) ++ wide: _*)
      .repartition(sys.env.getOrElse("GPQ_PARTS", "8").toInt)
      .persist()
    df.count()
    val times = (1 to 3).map { i =>
      val dir = java.nio.file.Files.createTempDirectory(s"gpqbench$i").toString
      val t0 = System.nanoTime()
      graft.sources.GeoParquet.write(df, dir, geometryTypes = Seq("Point"))
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      sec
    }
    val best = times.min
    println(f"[gpq-bench] rows=$n best=$best%.2fs rate=${n / best}%.0f rows/s (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
