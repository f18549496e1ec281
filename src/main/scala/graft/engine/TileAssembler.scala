package graft.engine

import graft.geo.TileCoord
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.CollectionAccumulator
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Phase 2+3 of the pipeline: global tile order + per-tile assembly.
 *
 * Spark shape (reference analog: external merge sort
 * `ExternalMergeSort.java` + tile writer `TileArchiveWriter.java`):
 *
 *   rendered
 *     .repartitionByRange($"tile_id")        // range shuffle on the
 *                                            // Hilbert id = the ONLY
 *                                            // global barrier
 *     .sortWithinPartitions(tile_id, layer, sort_key, feature_id)
 *     .mapPartitions(run-group consecutive tile_id -> encode tile)
 *
 * Every partition holds a contiguous, spatially-compact Hilbert range;
 * grouping is a streaming single-pass run-group (no hash shuffle —
 * reference does the same single-pass grouping on its sorted stream,
 * `FeatureGroup.java:339-378`). Partition index order == tile order, so
 * an ordered archive drain (mbtiles-style) is `toLocalIterator` over
 * already-sorted partitions, and a parallel files archive needs no
 * order at all.
 *
 * Skew: the label-grid limit is applied map-side BEFORE the shuffle as
 * a partial top-K (each input partition keeps at most `limit` rows per
 * (tile, layer, group) — keeping the first `limit` of a monotone
 * stream is a correct partial aggregation), then exactly after the
 * sort. Fill tiles arrive canonicalized (one identical row per tile)
 * from the slicer, so ocean-scale polygons cannot create hot keys.
 */
object TileAssembler {

  /** Map-side partial label-grid limit (safe pre-aggregation: the final
    * per-group top-K only needs each group's K smallest sort keys, and
    * each map partition independently keeps its K smallest). */
  def partialLabelGridLimit(rendered: Dataset[Rendered]): Dataset[Rendered] = {
    val spark = rendered.sparkSession
    import spark.implicits._
    rendered.mapPartitions { it =>
      // STREAM rows without a group straight through (no buffering);
      // hold bounded per-group heaps only for label-gridded rows.
      val heaps = mutable.HashMap.empty[(Long, String, Long), mutable.PriorityQueue[Rendered]]
      val grouped = it.filter { r =>
        if (r.group == 0 || r.group_limit <= 0) true
        else {
          val key = (r.tile_id, r.layer, r.group)
          val heap = heaps.getOrElseUpdate(key,
            mutable.PriorityQueue.empty[Rendered](Ordering.by(_.sort_key)))
          heap += r
          if (heap.size > r.group_limit) heap.dequeue() // drop largest sort_key
          false
        }
      }
      grouped ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  def assemble(rendered: Dataset[Rendered],
               profile: Profile,
               numPartitions: Int,
               gzipTiles: Boolean = true,
               lineage: Option[CollectionAccumulator[PartitionLineage]] = None,
               persistBeforeShuffle: Boolean = true): Dataset[TileBytes] = {
    val spark = rendered.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val pre0 = partialLabelGridLimit(rendered)
    // repartitionByRange runs a SAMPLING job over its child to pick
    // range bounds — without a persist that job re-executes the whole
    // upstream render fan-out a second time. Persist the rendered rows
    // once (serialized, spillable); at real scale this slot is the
    // stage-boundary snapshot table instead.
    val pre = if (persistBeforeShuffle)
      pre0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else pre0
    val sorted = pre
      .repartitionByRange(numPartitions, col("tile_id"))
      .sortWithinPartitions(col("tile_id"), col("layer"), col("sort_key"), col("feature_id"))

    sorted.mapPartitions { it =>
      new Iterator[TileBytes] {
        val peeked = it.buffered
        var partitionRows = 0L
        var minKey = Long.MaxValue
        var maxKey = Long.MinValue
        var reported = false

        override def hasNext: Boolean = {
          val more = peeked.hasNext
          if (!more && !reported) {
            reported = true
            lineage.foreach { acc =>
              acc.add(PartitionLineage("assemble",
                org.apache.spark.TaskContext.getPartitionId(), partitionRows, minKey, maxKey))
            }
          }
          more
        }

        override def next(): TileBytes = {
          val tileId = peeked.head.tile_id
          val feats = ArrayBuffer.empty[Rendered]
          while (peeked.hasNext && peeked.head.tile_id == tileId) {
            feats += peeked.next()
            partitionRows += 1
          }
          if (tileId < minKey) minKey = tileId
          if (tileId > maxKey) maxKey = tileId
          encodeTile(tileId, feats.toSeq, profile, gzipTiles)
        }
      }
    }
  }

  /** Encode one tile's features (already in (layer, sort_key) order:
    * single pass, no groupBy/sort — the sorted-run grouping the
    * reference does in `FeatureGroup.java:339-378`). */
  def encodeTile(tileId: Long, feats: Seq[Rendered], profile: Profile,
                 gzipTiles: Boolean): TileBytes = {
    val (x, y, z) = TileCoord.decodeHilbert(tileId)
    val layers = ArrayBuffer.empty[(String, Seq[Mvt.LayerFeature])]
    var curLayer: String = null
    var curFeats: ArrayBuffer[Mvt.LayerFeature] = null
    // exact label-grid limit within the sorted run (streaming counters,
    // reference: `FeatureGroup.java:616-637`)
    var counters: mutable.HashMap[Long, Int] = null
    var kept = 0
    def flush(): Unit = if (curLayer != null) {
      layers += ((curLayer, profile.postProcessLayer(curLayer, z, curFeats.toSeq)))
    }
    feats.foreach { r =>
      if (r.layer != curLayer) {
        flush()
        curLayer = r.layer
        curFeats = new ArrayBuffer[Mvt.LayerFeature](16)
        counters = null
      }
      val keep =
        if (r.group == 0 || r.group_limit <= 0) true
        else {
          if (counters == null) counters = mutable.HashMap.empty
          val c = counters.getOrElse(r.group, 0) + 1
          counters(r.group) = c
          c <= r.group_limit
        }
      if (keep) {
        curFeats += Mvt.LayerFeature(r.feature_id, r.geom_type, r.commands, r.attrs)
        kept += 1
      }
    }
    flush()
    val bytes0 = Mvt.encodeTile(layers.toSeq)
    val bytes = if (gzipTiles) Mvt.gzip(bytes0) else bytes0
    TileBytes(tileId, z, x, y, bytes, kept, Mvt.fnv1a64(bytes0))
  }

  /**
   * Parallel files-archive sink: {out}/{z}/{x}/{y}.pbf (the reference's
   * `files/WriteableFilesArchive` is the one archive that declares
   * concurrent-write support — the natural Spark sink; mbtiles/pmtiles
   * ordered drains use `toLocalIterator` over the range-sorted result).
   */
  def writeFilesArchive(tiles: Dataset[TileBytes], outDir: String): Long = {
    tiles.mapPartitions { it =>
      var n = 0L
      it.foreach { t =>
        val dir = java.nio.file.Paths.get(outDir, t.z.toString, t.x.toString)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"${t.y}.pbf"), t.bytes)
        n += 1
      }
      Iterator.single(n)
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
  }
}
