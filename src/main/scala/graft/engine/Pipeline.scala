package graft.engine

import graft.geo.Geo
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{LineString, Point => JtsPoint, Polygon => JtsPolygon, MultiPoint, MultiLineString, MultiPolygon}

/**
 * The flagship end-to-end dataflow (reference: `Planetiler.run()`
 * three-phase pipeline, `Planetiler.java:791-996`):
 *
 *   docs (interleaved text+media)                       [scan]
 *    -> SourceFeature (geom spans parsed, span_sig)     [project]
 *    -> Profile.processFeature                          [flatMap]
 *    -> Render: zoom explode -> simplify -> tile slice  [flatMap fan-out]
 *    -> repartitionByRange(hilbert tile id) + sort      [the one shuffle]
 *    -> per-tile assemble (label grid, merge, MVT+gzip) [mapPartitions]
 *    -> files archive / tiles dataset                   [sink]
 *
 * Checkpoint/resume: each named stage can snapshot its output as
 * parquet with a _SUCCESS marker; a resumed run short-circuits to the
 * snapshot (the analog of the reference's reusable feature DB,
 * `Planetiler.java:862-979`).
 */
object Pipeline {

  /** Default profile: one layer per geometry family, zoom ranges sized
    * so the synthetic world renders a full pyramid without exploding
    * the small-SF test runtime. With `pip` set, every point feature is
    * assigned its containing admin polygon (broadcast STRtree probe) —
    * the north-star metric path is encode -> PIP join -> tile write. */
  class GraftProfile(pointMaxZoom: Int = 8, lineMaxZoom: Int = 8, polyMaxZoom: Int = 7,
                     pip: Option[SpatialJoin.PolygonIndex] = None)
      extends Profile {
    override val layers: IndexedSeq[String] = Vector("admin", "lines", "points", "hillshade")

    /** Raster shade bands merge per tile through the same
      * mergeNearbyPolygons semantics as any polygon layer (SURVEY
      * §7.6: "just another polygon layer"): same-band patches within
      * half a pixel union into one (multi)polygon. */
    override def postProcessLayer(layer: String, zoom: Int,
                                  features: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] =
      if (layer == "hillshade")
        FeatureMerge.mergeNearbyPolygons(features, minDistPx = 0.5)
      else features
    override def processFeature(sf: SourceFeature): Iterator[FeatureSpec] = {
      val geom = Geo.fromWkb(sf.geom)
      val world = Geo.latLonToWorld(geom)
      // abs AFTER widening: math.abs(Int.MinValue) is still negative,
      // and a negative id would MVT-encode as a bogus huge uint64
      val id = math.abs(sf.doc_id.hashCode.toLong)
      geom match {
        case p: JtsPoint =>
          val c = p.getCoordinate
          // broadcast index when present; else the RESERVED pre-attached
          // tag from the partitioned-PIP scale path
          // (SpatialJoin.attachContainingPolygonTag) — never an
          // ordinary input tag, which cannot use the reserved key
          val adm = pip.flatMap(_.firstContaining(c.x, c.y)).map(_.id)
            .orElse(sf.tags.get(SpatialJoin.PipTagKey))
          Iterator.single(FeatureSpec(
            layer = "points", geom = Geo.toWkb(world), id = id,
            sortKey = (id % 1000).toInt, minzoom = 0, maxzoom = pointMaxZoom,
            attrs = Map("text" -> sf.tags.getOrElse("text", "")) ++
              adm.map("adm" -> _),
            labelGridPixelSize = 64, labelGridLimit = 16))
        case _: MultiPoint =>
          Iterator.single(FeatureSpec(
            layer = "points", geom = Geo.toWkb(world), id = id,
            sortKey = (id % 1000).toInt, minzoom = 0, maxzoom = pointMaxZoom,
            attrs = Map("text" -> sf.tags.getOrElse("text", "")),
            labelGridPixelSize = 64, labelGridLimit = 16))
        case _: LineString | _: MultiLineString =>
          Iterator.single(FeatureSpec(
            layer = "lines", geom = Geo.toWkb(world), id = id,
            sortKey = (id % 1000).toInt, minzoom = 4, maxzoom = lineMaxZoom,
            attrs = Map("text" -> sf.tags.getOrElse("text", ""))))
        case _: JtsPolygon | _: MultiPolygon =>
          // raster-derived shade bands ride as their own polygon layer
          val layer = if (sf.tags.get("layer").contains("hillshade")) "hillshade" else "admin"
          Iterator.single(FeatureSpec(
            layer = layer, geom = Geo.toWkb(world), id = id,
            sortKey = (id % 1000).toInt, minzoom = 0, maxzoom = polyMaxZoom,
            attrs = Map("text" -> sf.tags.getOrElse("text", "")) ++
              sf.tags.get("band").map("band" -> _)))
        case _ => Iterator.empty
      }
    }
  }

  /**
   * docs -> Rendered. `rebalance` round-robins the doc rows across
   * `numPartitions` BEFORE the CPU-heavy parse/render fan-out: a small
   * ingest (one parquet split, one Iceberg file) would otherwise pin
   * the whole render phase to one task. At real scale the input
   * arrives in thousands of splits and the extra shuffle is skipped.
   */
  def renderedFromDocs(docs: DataFrame, profile: Profile,
                       rebalance: Int = 0): Dataset[Kv] = {
    // only shuffle when the input actually arrives UNDER-split (the
    // one-parquet-file small-ingest case); an input already at or past
    // the target keeps its partitioning and skips the raw-doc shuffle
    val balanced =
      if (rebalance > 0 && docs.rdd.getNumPartitions < rebalance) docs.repartition(rebalance)
      else docs
    renderedFromFeatures(Docs.sourceFeatures(balanced), profile)
  }

  /** Full pipeline: docs -> encoded tiles dataset. */
  def tiles(docs: DataFrame, profile: Profile = new GraftProfile(),
            numPartitions: Int = 32, gzipTiles: Boolean = true): Dataset[TileBytes] =
    TileAssembler.assemble(renderedFromDocs(docs, profile, rebalance = numPartitions),
      profile, numPartitions, gzipTiles)

  /** Pre-built SourceFeatures (e.g. an OSM PBF ingest, [[Osm]]) ->
    * rendered Kv rows, with the same end-of-source flush
    * (Profile.finish, reference Profile.java:226). `rebalance`
    * round-robins BEFORE the CPU-heavy flatMap — same single-split
    * hazard as [[renderedFromDocs]]. */
  def renderedFromFeatures(sf: Dataset[SourceFeature], profile: Profile,
                           rebalance: Int = 0): Dataset[Kv] = {
    val spark = sf.sparkSession
    import spark.implicits._
    val balanced = if (rebalance > 0) sf.repartition(rebalance) else sf
    val specs = balanced.flatMap(profile.processFeature _)
    val withFinish =
      if (profile.sources.isEmpty) specs
      else specs.unionByName(
        spark.createDataset(profile.sources.flatMap(profile.finish).toSeq))
    Render.renderKv(withFinish, profile.layers)
  }

  /** SourceFeatures -> encoded tiles (full assemble path). `rebalance`
    * stays opt-in here: join-produced features (the OSM path) are
    * already spread across shuffle partitions and an unconditional
    * repartition would just add an exchange; pass it when the features
    * derive from a small file scan. */
  def tilesFromFeatures(sf: Dataset[SourceFeature], profile: Profile = new GraftProfile(),
                        numPartitions: Int = 32, gzipTiles: Boolean = true,
                        rebalance: Int = 0): Dataset[TileBytes] =
    TileAssembler.assemble(renderedFromFeatures(sf, profile, rebalance),
      profile, numPartitions, gzipTiles)

  /**
   * Stage snapshot: compute-or-resume. If `dir` holds a committed
   * snapshot, read it (executor-loss / rerun resume path); otherwise
   * compute, write, and re-read so downstream lineage starts at the
   * snapshot.
   */
  /**
   * Iceberg-style VERSIONED snapshots: each call that computes writes
   * `snapshot-N` under `tableDir` and commits it by atomically renaming
   * a version-hint file — readers only ever see fully committed
   * versions, an interrupted writer leaves the previous version live,
   * and a resumed run short-circuits to the latest commit. The
   * mini-table-format analog of the reference's reusable feature DB +
   * the north rule's "resume from Iceberg snapshot".
   */
  /** The committed snapshot version under `base`, or None. THE shared
    * hint probe — snapshotVersioned and Streams.readCommittedTiles
    * both resolve versions through it, so the two can't drift on the
    * recovery rule: if the hint file is missing but a
    * `.version-hint.N.tmp` exists, a writer died in the delete->rename
    * window AFTER snapshot N fully wrote, and the commit is rolled
    * FORWARD (tmp renamed into place). Snapshot dirs themselves are
    * NOT trusted: the hint rename is the commit point, and a
    * fully-written dir without a hint is semantically uncommitted. */
  private[graft] def committedVersion(fs: org.apache.hadoop.fs.FileSystem,
                                      base: org.apache.hadoop.fs.Path): Option[Int] = {
    val hint = new org.apache.hadoop.fs.Path(base, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    } else if (!fs.exists(base)) None
    else {
      val tmps = fs.listStatus(base).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith(".version-hint.") && n.endsWith(".tmp") =>
          n.stripPrefix(".version-hint.").stripSuffix(".tmp") }
        .collect { case n if n.nonEmpty && n.forall(_.isDigit) => n.toInt }
      if (tmps.isEmpty) None
      else {
        val v = tmps.max
        fs.rename(new org.apache.hadoop.fs.Path(base, s".version-hint.$v.tmp"), hint)
        Some(v)
      }
    }
  }

  def snapshotVersioned[T](ds: Dataset[T], tableDir: String, recompute: Boolean = false)(
      implicit enc: org.apache.spark.sql.Encoder[T]): (Dataset[T], Int) = {
    val spark = ds.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(tableDir)
    val fs = base.getFileSystem(conf)
    val hint = new org.apache.hadoop.fs.Path(base, "version-hint.text")
    committedVersion(fs, base) match {
      case Some(v) if !recompute =>
        (spark.read.parquet(s"$tableDir/snapshot-$v").as[T], v)
      case prev =>
        val v = prev.map(_ + 1).getOrElse(1)
        ds.write.mode("overwrite").parquet(s"$tableDir/snapshot-$v")
        // commit: write hint to a temp file, rename over (atomic on
        // HDFS/posix; object stores get read-after-write of the copy)
        val tmp = new org.apache.hadoop.fs.Path(base, s".version-hint.$v.tmp")
        val out = fs.create(tmp, true)
        out.write(v.toString.getBytes("UTF-8"))
        out.close()
        if (fs.exists(hint)) fs.delete(hint, false)
        require(fs.rename(tmp, hint), s"failed to commit version hint $v at $hint")
        (spark.read.parquet(s"$tableDir/snapshot-$v").as[T], v)
    }
  }

  /**
   * Snapshot maintenance (the Iceberg `expireSnapshots` analog): drop
   * all but the newest `keep` committed versions under `tableDir`.
   * The live version (per version-hint) is never deleted; uncommitted
   * snapshot dirs newer than the hint (a writer died mid-write) are
   * removed too. Returns the deleted version numbers.
   */
  def expireSnapshots(spark: SparkSession, tableDir: String, keep: Int = 2): Seq[Int] = {
    require(keep >= 1, "must keep at least the live snapshot")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(tableDir)
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) return Seq.empty
    val hint = new org.apache.hadoop.fs.Path(base, "version-hint.text")
    if (!fs.exists(hint)) return Seq.empty
    val live = {
      val in = fs.open(hint)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim.toInt
      finally in.close()
    }
    val versions = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot-"))
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix("snapshot-").toInt).toOption)
      .sorted
    val keepSet = versions.filter(_ <= live).takeRight(keep).toSet + live
    val doomed = versions.filterNot(keepSet.contains)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"snapshot-$v"), true)
    }
    doomed
  }

  def checkpoint[T](ds: Dataset[T], dir: String)(implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val spark = ds.sparkSession
    // probe through the Hadoop FileSystem API so the _SUCCESS marker
    // check honors the path's scheme (hdfs://, s3a://, ...) — a
    // java.io.File probe always reports false off the local FS and the
    // snapshot would be recomputed on every resume
    val path = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      ds.write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir).as[T]
  }
}
