package graft.engine

import graft.Bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** TEMPORARY measurement probe (guide §1): breaks the flagship reduce
  * stage's per-tile cost into decode / assemble+mvt / gzip components
  * with executor-side nano timers. Not part of any bench contract. */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "4").toInt
    val mz = sys.env.getOrElse("SPARK_GRAFT_MAXZOOM", "12").toInt
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val polys = SpatialJoin.collectPolys(
      Docs.sourceFeatures(Docs.polygonDocs(spark, sfDir)).toDF())
    val profile = new Pipeline.GraftProfile(pointMaxZoom = mz, lineMaxZoom = mz,
      polyMaxZoom = math.min(7, mz), pip = Some(new SpatialJoin.PolygonIndex(polys)))
    Docs.synthParallelism = 32
    val dir = Bench.prepareDocsInput(spark, sfDir, mult, 64)
    val docs = spark.read.parquet(dir)

    val decodeNs = spark.sparkContext.longAccumulator("decodeNs")
    val encodeNs = spark.sparkContext.longAccumulator("encodeNs")
    val gzipNs = spark.sparkContext.longAccumulator("gzipNs")
    val rows = spark.sparkContext.longAccumulator("rows")
    val tiles = spark.sparkContext.longAccumulator("tiles")
    val bytesRaw = spark.sparkContext.longAccumulator("bytesRaw")

    for (r <- 1 to 3) {
      decodeNs.reset(); encodeNs.reset(); gzipNs.reset(); rows.reset(); tiles.reset(); bytesRaw.reset()
      val rendered = Pipeline.renderedFromDocs(docs, profile, rebalance = 0)
      val pre = TileAssembler.partialLabelGridLimit(rendered)
      val targetBuckets = threads * 4
      val bounds = TileAssembler.sampleRangeBounds(rendered, targetBuckets)
      val buckets = bounds.length + 1
      val steer = org.apache.spark.sql.graftbridge.SqlBridge.col(
        TileAssembler.RangeSteer(org.apache.spark.sql.graftbridge.SqlBridge.expr(col("key")),
          bounds, TileAssembler.hashPreimages(buckets)))
      val sorted = pre.repartition(buckets, steer)
        .sortWithinPartitions(col("key"), col("meta"), col("value"))
      val layers = profile.layers
      val t0 = System.nanoTime()
      val out = sorted.mapPartitions { it =>
        val peeked = it.buffered
        new Iterator[Long] {
          override def hasNext: Boolean = peeked.hasNext
          override def next(): Long = {
            val tileId = peeked.head.key
            val feats = scala.collection.mutable.ArrayBuffer.empty[graft.model.Rendered]
            var t = System.nanoTime()
            while (peeked.hasNext && peeked.head.key == tileId) {
              feats += KvCodec.decode(peeked.next(), layers)
              rows.add(1)
            }
            decodeNs.add(System.nanoTime() - t)
            t = System.nanoTime()
            val tb = TileAssembler.encodeTile(tileId, feats.toSeq, profile, gzipTiles = false)
            encodeNs.add(System.nanoTime() - t)
            bytesRaw.add(tb.bytes.length)
            t = System.nanoTime()
            val gz = Mvt.gzip(tb.bytes)
            gzipNs.add(System.nanoTime() - t)
            tiles.add(1)
            tileId + gz.length
          }
        }
      }
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE r$r wall=$wall%.2f tiles=${tiles.value} rows=${rows.value} " +
        f"decode=${decodeNs.value / 1e9}%.2fs encode=${encodeNs.value / 1e9}%.2fs gzip=${gzipNs.value / 1e9}%.2fs " +
        f"rawBytes=${bytesRaw.value / 1e6}%.1fMB perTile=${(decodeNs.value + encodeNs.value + gzipNs.value) / math.max(1, tiles.value) / 1e3}%.1fus " +
        f"(d=${decodeNs.value / math.max(1, tiles.value) / 1e3}%.1f e=${encodeNs.value / math.max(1, tiles.value) / 1e3}%.1f g=${gzipNs.value / math.max(1, tiles.value) / 1e3}%.1f)")
    }
    spark.stop()
  }
}
