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
 *   kv rows (key=Hilbert tile id, meta=layer|sortKey|id, value=bytes)
 *     .repartitionByRange($"key")          // THE shuffle
 *     .sortWithinPartitions(key, meta, value)
 *     .mapPartitions(run-group consecutive key -> encode tile)
 *
 * Sorting touches two longs (plus byte tie-break, mirroring the
 * reference's `SortableFeature` unsigned-byte tie-break); every
 * partition holds a contiguous, spatially-compact Hilbert range, so
 * grouping is a streaming single-pass run-group (reference
 * `FeatureGroup.java:339-378`) and partition order == tile order for
 * the ordered archive drain.
 *
 * Skew: the label-grid limit is applied map-side BEFORE the shuffle as
 * a partial top-K (bounded per-group heaps — keeping each group's K
 * smallest sort keys per map partition is a correct partial
 * aggregation), then exactly within the sorted run. Fill tiles arrive
 * canonicalized from the slicer, so ocean-scale polygons cannot create
 * hot keys.
 */
object TileAssembler {

  /** Upper bound on distinct (tile, layer, group) heads the map-side
    * partial top-K retains per input partition. The pass is purely a
    * shuffle-byte optimization — the exact in-run counter in
    * [[encodeTile]] enforces the limit regardless — so past the cap new
    * groups flow through untouched instead of growing the heap map
    * without bound (a render partition can fan out across millions of
    * tiles; ~64k heaps of ≤limit rows is a few MB, not the partition's
    * whole grouped output). */
  val PartialLimitMaxGroups = 1 << 16

  /** Total order matching the post-shuffle `sortWithinPartitions(key,
    * meta, value)`: the map-side partial must keep exactly the rows the
    * exact in-run counter would keep, so ties in sort_key break on
    * (meta, value) — NOT on arrival order, which would make tile bytes
    * depend on upstream row order. */
  private val kvHeapOrdering: Ordering[Kv] = new Ordering[Kv] {
    def compare(a: Kv, b: Kv): Int = {
      val m = java.lang.Long.compare(a.meta, b.meta)
      if (m != 0) return m
      val av = a.value; val bv = b.value
      val n = math.min(av.length, bv.length)
      var i = 0
      while (i < n) {
        val c = (av(i) & 0xff) - (bv(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      av.length - bv.length
    }
  }

  /** Map-side partial label-grid limit over the packed rows. */
  def partialLabelGridLimit(kv: Dataset[Kv],
                            maxGroups: Int = PartialLimitMaxGroups): Dataset[Kv] = {
    val spark = kv.sparkSession
    import spark.implicits._
    kv.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[(Long, Int, Long), mutable.PriorityQueue[Kv]]
      // trim each heap to the LARGEST limit seen for its group, not the
      // arriving row's: with mixed per-feature limits in one grid cell a
      // small-limit row could otherwise evict a row the exact in-run
      // counter keeps — the partial must stay a SUPERSET of the exact
      // pass (which enforces each row's own limit downstream)
      val maxLimits = mutable.HashMap.empty[(Long, Int, Long), Int]
      val grouped = it.filter { r =>
        val (group, limit) = KvCodec.peekGroup(r.value)
        if (group == 0 || limit <= 0) true
        else {
          val k = (r.key, KvCodec.layerId(r.meta), group)
          heaps.get(k) match {
            case None if heaps.size >= maxGroups => true // lossy-in-coverage past cap
            case existing =>
              val heap = existing.getOrElse {
                val h = mutable.PriorityQueue.empty[Kv](kvHeapOrdering)
                heaps.put(k, h)
                h
              }
              val maxLimit = math.max(limit, maxLimits.getOrElse(k, 0))
              maxLimits.put(k, maxLimit)
              heap += r
              if (heap.size > maxLimit) heap.dequeue() // drop largest (meta, value)
              false
          }
        }
      }
      grouped ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  def assemble(kv: Dataset[Kv],
               profile: Profile,
               numPartitions: Int,
               gzipTiles: Boolean = true,
               lineage: Option[CollectionAccumulator[PartitionLineage]] = None,
               persistBeforeShuffle: Boolean = false): Dataset[TileBytes] = {
    val spark = kv.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val pre0 = partialLabelGridLimit(kv)
    // repartitionByRange samples its child to pick bounds; persisting
    // here trades memory for skipping one recompute of the render
    // fan-out (at real scale this slot is the snapshot table).
    val pre = if (persistBeforeShuffle)
      pre0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else pre0
    val sorted = pre
      .repartitionByRange(numPartitions, col("key"))
      .sortWithinPartitions(col("key"), col("meta"), col("value"))
    val layers = profile.layers

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
          val tileId = peeked.head.key
          val feats = ArrayBuffer.empty[Rendered]
          while (peeked.hasNext && peeked.head.key == tileId) {
            feats += KvCodec.decode(peeked.next(), layers)
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
    val rawLayers = ArrayBuffer.empty[(String, Seq[Mvt.LayerFeature])]
    var curLayer: String = null
    var curFeats: ArrayBuffer[Mvt.LayerFeature] = null
    // exact label-grid limit within the sorted run (streaming counters,
    // reference: `FeatureGroup.java:616-637`)
    var counters: mutable.HashMap[Long, Int] = null
    def flush(): Unit = if (curLayer != null) {
      rawLayers += ((curLayer, curFeats.toSeq))
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
      if (keep) curFeats += Mvt.LayerFeature(r.feature_id, r.geom_type, r.commands, r.attrs, r.scale)
    }
    flush()
    // cross-layer tile hook FIRST (may move features between layers),
    // then the per-layer hook — same order as the reference. A null
    // return means "unchanged" (reference contract); profiles that
    // never override the hook skip the per-tile map build entirely.
    val afterTile = profile.postProcessTile(z, x, y, rawLayers.toMap)
    val orderedLayers: Seq[(String, Seq[Mvt.LayerFeature])] =
      if (afterTile == null) rawLayers.toSeq
      else {
        // keep the profile's declared layer order; any new layers the
        // hook introduced append in name order
        (profile.layers.filter(afterTile.contains) ++
          afterTile.keys.filterNot(profile.layers.contains).toSeq.sorted)
          .map(name => (name, afterTile(name)))
      }
    val layers = orderedLayers.map { case (name, fs) =>
      // unscale extra-precision features AFTER merge post-processing
      // (reference order: FeatureGroup unscales before the archive
      // write); collapsed geometries drop out here
      val processed = profile.postProcessLayer(name, z, fs).flatMap { f =>
        if (f.scale <= 0) Some(f)
        else {
          val cmds = Mvt.unscale(f.geomType, f.commands, f.scale)
          if (cmds.isEmpty) None else Some(f.copy(commands = cmds, scale = 0))
        }
      }
      (name, processed)
    }.filter(_._2.nonEmpty)
    val kept = layers.map(_._2.size).sum
    val bytes0 = Mvt.encodeTile(layers)
    val bytes = if (gzipTiles) Mvt.gzip(bytes0) else bytes0
    TileBytes(tileId, z, x, y, bytes, kept, Mvt.fnv1a64(bytes0))
  }

  /**
   * Parallel files-archive sink: {out}/{z}/{x}/{y}.pbf (the reference's
   * `files/WriteableFilesArchive` is the one archive that declares
   * concurrent-write support — the natural Spark sink; the ordered
   * single-file drain is `ClusteredArchive`).
   */
  def writeFilesArchive(tiles: Dataset[TileBytes], outDir: String): Long = {
    tiles.mapPartitions { it =>
      var n = 0L
      // tiles arrive Hilbert-ordered, so long runs share one {z}/{x}
      // directory — cache the last created dir instead of a
      // createDirectories metadata syscall per tile
      var lastDirKey: Long = -1L
      var lastDir: java.nio.file.Path = null
      it.foreach { t =>
        val dirKey = (t.z.toLong << 32) | (t.x.toLong & 0xffffffffL)
        if (dirKey != lastDirKey) {
          lastDir = java.nio.file.Paths.get(outDir, t.z.toString, t.x.toString)
          java.nio.file.Files.createDirectories(lastDir)
          lastDirKey = dirKey
        }
        java.nio.file.Files.write(lastDir.resolve(s"${t.y}.pbf"), t.bytes)
        n += 1
      }
      Iterator.single(n)
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
  }
}
