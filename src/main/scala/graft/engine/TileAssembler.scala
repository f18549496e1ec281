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

  /** Murmur3/pmod preimages: ints j(0..n-1) with
    * pmod(murmur3(j, 42), n) == i — hash-partitioning on the looked-up
    * preimage steers a row to EXACTLY partition i, which lets a plain
    * `repartition(n, expr)` express explicit range partitioning with
    * no sampling pass (partition index stays monotone in the range
    * bucket, which the ordered archive drains rely on). */
  private[engine] def hashPreimages(n: Int): Array[Int] = {
    val pre = new Array[Int](n)
    val found = new Array[Boolean](n)
    var remaining = n
    var j = 0
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; pre(p) = j; remaining -= 1 }
      j += 1
    }
    pre
  }

  /** Range-steering expression: binary-search the sampled bounds,
    * output the preimage int for the bucket. One lookup per row,
    * evaluated inside the exchange's partitioner projection. */
  private[engine] case class RangeSteer(child: org.apache.spark.sql.catalyst.expressions.Expression,
                                        bounds: Array[Long], preimages: Array[Int])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override protected def nullSafeEval(v: Any): Any = {
      val ip = java.util.Arrays.binarySearch(bounds, v.asInstanceOf[Long])
      preimages(if (ip >= 0) ip else -(ip + 1))
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): RangeSteer = copy(child = c)
  }

  /** Doc-sampling fraction for the bound estimate: ~1% of the input
    * rows rendered through the same fan-out — unbiased in key space
    * (unlike a take-N head sample, which inherits whatever ordering
    * the input files have) at ~1% of the render cost. */
  private val BoundSampleFraction = 0.01

  /**
   * SAMPLE-PUSHDOWN key sample: re-execute the kv plan with a
   * `Sample(fraction)` node injected directly above every file-scan
   * leaf. Every operator between the scan and the kv rows is a
   * deterministic per-row transform (parse -> processFeature -> render
   * fan-out), so sampling the docs first yields exactly the key
   * distribution of a post-compute sample at a fraction of the cost —
   * the pushdown `repartitionByRange`'s own sampler cannot do (it
   * samples its immediate child, recomputing the whole fan-out).
   * Returns None when the plan has no file-scan leaf to push below.
   */
  private[engine] def sampleKeysPushdown(kv: Dataset[Kv]): Option[Array[Long]] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sample}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    import org.apache.spark.sql.functions.col
    var injected = false
    val plan: LogicalPlan = kv.queryExecution.logical.transformUp {
      case lr: LogicalRelation =>
        injected = true; Sample(0.0, BoundSampleFraction, withReplacement = false, 42L, lr)
      case dr: DataSourceV2Relation =>
        injected = true; Sample(0.0, BoundSampleFraction, withReplacement = false, 42L, dr)
    }
    if (!injected) return None
    val spark = kv.sparkSession
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("assemble: range-bound sample (pushed-down doc sample)")
    try {
      Some(org.apache.spark.sql.graftbridge.SqlBridge.ofRows(spark, plan)
        .select(col("key")).collect().map(_.getLong(0)))
    } catch { case _: Exception => None }
    finally sc.setJobDescription(prev)
  }

  /** Fallback partial-scan sample: `iterator.take(n)` on a spread of
    * input partitions (pull-based upstream computes only what the take
    * consumes). Biased toward each partition's head ordering — only
    * used when no scan leaf exists for [[sampleKeysPushdown]]. */
  private[engine] def sampleKeysPartial(kv: Dataset[Kv], buckets: Int): Array[Long] = {
    import org.apache.spark.sql.functions.col
    val keyRdd = kv.toDF().select(col("key")).rdd
    val total = keyRdd.getNumPartitions
    if (total == 0) return Array.empty
    val k = math.min(total, 16)
    val picks = (0 until k).map(i => (i.toLong * total / k).toInt).distinct.toArray
    val perPart = math.min(1 << 16, math.max(4096, buckets * 1024 / picks.length))
    val sc = kv.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("assemble: range-bound sample (partial scan)")
    try sc.runJob(keyRdd,
      (it: Iterator[org.apache.spark.sql.Row]) => it.take(perPart).map(_.getLong(0)).toArray,
      picks.toSeq).flatten
    finally sc.setJobDescription(prev)
  }

  /** Equal-frequency bounds (deduped) over the pooled key sample. */
  private[engine] def sampleRangeBounds(kv: Dataset[Kv], buckets: Int): Array[Long] = {
    if (buckets <= 1) return Array.empty
    val sample = sampleKeysPushdown(kv).getOrElse(sampleKeysPartial(kv, buckets))
    if (sample.isEmpty) return Array.empty
    java.util.Arrays.sort(sample)
    val bounds = ArrayBuffer.empty[Long]
    var i = 1
    while (i < buckets) {
      val q = sample(((i.toLong * (sample.length - 1)) / buckets).toInt)
      if (bounds.isEmpty || q > bounds.last) bounds += q
      i += 1
    }
    bounds.toArray
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

    // `persistBeforeShuffle` is retired (kept for source compat): it
    // existed to keep repartitionByRange's bound-sampling job from
    // recomputing the render fan-out. The explicit-bounds shuffle below
    // replaces that full sampling pass with a partial take()-scan, so
    // the fan-out computes exactly ONCE and nothing needs caching.
    val pre = partialLabelGridLimit(kv)
    // 6x buckets per slot: per-ROW encode cost varies by zoom region
    // (many tiny tiles pay per-tile gzip/alloc overhead), so equal-row
    // buckets alone leave a 2-3x straggler at the stage tail; finer
    // buckets let the scheduler pack them (guide §2.5/§2.6). Measured
    // on the scaling workload at 16 threads: 4x left reduce-stage
    // occupancy at 0.81-0.86 (last-wave tail); 6x packs it tighter at
    // negligible per-task overhead (16x96 shuffle blocks).
    val targetBuckets = if (numPartitions <= 1) 1 else numPartitions * 6
    val bounds = sampleRangeBounds(kv, targetBuckets)
    val buckets = bounds.length + 1
    val steer = org.apache.spark.sql.graftbridge.SqlBridge.col(
      RangeSteer(org.apache.spark.sql.graftbridge.SqlBridge.expr(col("key")),
        bounds, hashPreimages(buckets)))
    val sorted = pre
      .repartition(buckets, steer)
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
