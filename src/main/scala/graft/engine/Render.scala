package graft.engine

import graft.geo.{Geo, Mercator, Simplify, TileCoord}
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.locationtech.jts.geom.{Geometry, Point => JtsPoint, MultiPoint}

/**
 * Profile API — the user-facing "query language" of the engine, the
 * analog of the reference's `Profile.processFeature` callback
 * (planetiler `Profile.java:36`, `FeatureCollector.java:72-80`): map one
 * source feature to zero-or-more output feature specs. Runs inside a
 * typed `flatMap`, so the surrounding plan stays declarative.
 */
trait Profile extends Serializable {
  def processFeature(sf: SourceFeature): Iterator[FeatureSpec]
  /** Declared output layers, in per-tile encode order. Layer ids pack
    * into the shuffled row's meta long (<=255 layers, like the
    * reference's one-byte layer interning `FeatureGroup.java:65`). */
  def layers: IndexedSeq[String]
  /** Per-tile-layer post-process hook (merge, limit...), pure function. */
  def postProcessLayer(layer: String, zoom: Int,
                       features: Seq[Mvt.LayerFeature]): Seq[Mvt.LayerFeature] = features

  /** Cross-layer tile post-process hook, dispatched BEFORE the
    * per-layer pass (reference `Profile.java:148`, ordering
    * `collection/FeatureGroup.java:558-571`): sees every layer of one
    * tile at once and may move/merge/drop features across layers.
    * Return the new layer map (missing layers are dropped), or null to
    * leave the tile unchanged — same contract as the reference; the
    * default null also lets the assembler skip building the per-tile
    * map entirely when no profile overrides this. */
  def postProcessTile(zoom: Int, x: Int, y: Int,
                      tileLayers: Map[String, Seq[Mvt.LayerFeature]]): Map[String, Seq[Mvt.LayerFeature]] =
    null

  /** Declared input sources, used to dispatch [[finish]] once per
    * source after its elements are processed (reference
    * `Profile.java:226`). Empty = no finish dispatch. */
  def sources: Seq[String] = Seq.empty

  /** End-of-source flush: emit extra features after every element of
    * `source` has been processed (the reference passes a feature
    * consumer; here the returned specs join the render stream). */
  def finish(source: String): Iterator[FeatureSpec] = Iterator.empty
}

/**
 * Render stage: FeatureSpec -> per-(zoom, tile) Rendered rows.
 *
 * Spark shape: one typed `flatMap` that explodes each spec across its
 * zoom range, applies the cheap pixel-size gate BEFORE any geometry
 * work (reference: `FeatureRenderer.java:71-97`), simplifies at the
 * zoom's resolution (Douglas-Peucker, `simplifyTolerancePx`), then
 * fans out via the stripe-clip tile slicer. The output is keyed by the
 * Hilbert tile id, ready for `repartitionByRange`.
 */
object Render {

  def render(specs: Dataset[FeatureSpec]): Dataset[Rendered] = {
    val spark = specs.sparkSession
    import spark.implicits._
    specs.flatMap(renderOne _)
  }

  /** Render straight to the packed shuffle rows (no intermediate
    * Rendered dataset — the flatMap emits `(key, meta, value)`). */
  def renderKv(specs: Dataset[FeatureSpec], layers: IndexedSeq[String]): Dataset[Kv] = {
    val spark = specs.sparkSession
    import spark.implicits._
    // the packed meta interns the layer as ONE byte; layer 256 would
    // silently alias layer 0 through the 8-bit mask
    require(layers.size <= 256,
      s"at most 256 layers fit the one-byte meta interning; got ${layers.size}")
    val layerIdx: Map[String, Int] = layers.zipWithIndex.toMap
    specs.flatMap { spec =>
      val id = layerIdx.getOrElse(spec.layer,
        throw new IllegalArgumentException(s"undeclared layer ${spec.layer}"))
      renderOne(spec).map(KvCodec.encode(_, id))
    }
  }

  def renderOne(spec: FeatureSpec): Iterator[Rendered] = {
    // fail fast: a zoom past TileCoord.MaxZoom would silently encode
    // tile ids that decode as the wrong z-15 tiles (z=16 indexes the
    // pyramid-total offset) or crash deep in the flatMap (z>=17)
    require(spec.maxzoom <= graft.geo.TileCoord.MaxZoom && spec.minzoom >= 0,
      s"zoom range [${spec.minzoom},${spec.maxzoom}] outside [0,${graft.geo.TileCoord.MaxZoom}] " +
        s"for layer ${spec.layer}")
    val geom =
      try Geo.fromWkb(spec.geom)
      catch { case _: Exception => null }
    if (geom == null || geom.isEmpty) Iterator.empty
    else {
      // pack attrs ONCE per distinct zoom range (ZoomFunction unwrap:
      // overrides merge in at their minzoom thresholds); every emitted
      // row of a range shares the same byte array
      val packedAt: Int => Array[Byte] =
        if (spec.zoomAttrs.isEmpty) {
          val base = Attrs.pack(spec.attrs)
          _ => base
        } else {
          val cache = scala.collection.mutable.HashMap.empty[Int, Array[Byte]]
          z => cache.getOrElseUpdate(
            spec.zoomAttrs.takeWhile(_._1 <= z).length, // range index
            Attrs.pack(spec.zoomAttrs.takeWhile(_._1 <= z)
              .foldLeft(spec.attrs)((acc, o) => acc ++ o._2)))
        }
      (spec.minzoom to spec.maxzoom).iterator.flatMap { z =>
        renderAtZoom(spec, geom, z, packedAt(z))
      }
    }
  }

  private def renderAtZoom(spec: FeatureSpec, geom: Geometry, z: Int, attrs: Array[Byte]): Iterator[Rendered] = {
    val isPoint = geom.isInstanceOf[JtsPoint] || geom.isInstanceOf[MultiPoint]
    val pxPerWorld = 256.0 * (1 << z)
    if (!isPoint && spec.minPixelSize > 0) {
      // cheap envelope gate: skip rendering shapes smaller than
      // minPixelSize px at this zoom (lines use length proxy = diagonal)
      val env = geom.getEnvelopeInternal
      val spanPx = math.max(env.getWidth, env.getHeight) * pxPerWorld
      if (spanPx < spec.minPixelSize) return Iterator.empty
    }
    val simplified0 =
      if (isPoint || spec.simplifyTolerancePx <= 0) geom
      else Simplify.dp(geom, spec.simplifyTolerancePx / pxPerWorld)
    if (simplified0 == null || simplified0.isEmpty) return Iterator.empty
    // polygons invalidated by simplification/source data go through the
    // snapAndFixPolygon escalation chain at this zoom's grid resolution
    // (reference `GeoUtils.java:315-399`); valid shapes pass untouched
    val simplified =
      if ((simplified0.isInstanceOf[org.locationtech.jts.geom.Polygon] ||
           simplified0.isInstanceOf[org.locationtech.jts.geom.MultiPolygon]) &&
          !simplified0.isValid) {
        try graft.geo.PolygonFixer.snapAndFix(simplified0,
          new org.locationtech.jts.geom.PrecisionModel(4096.0 * (1 << z)))
        catch { case _: Exception => return Iterator.empty } // unrecoverable: drop
      } else simplified0
    if (simplified == null || simplified.isEmpty) return Iterator.empty

    // label grid: quantize the feature's first point into a grid cell at
    // this zoom (reference: `GeoUtils.java:414-427` longFromDoubles of
    // floor-quantized world coords)
    val group: Long =
      if (spec.labelGridPixelSize > 0 && isPoint) {
        val c = geom.getCoordinate
        val cells = pxPerWorld / spec.labelGridPixelSize
        val gx = math.floor(c.x * cells).toLong
        val gy = math.floor(c.y * cells).toLong
        // lossless pack: gx/gy fit 30 bits at any zoom<=22 with >=64px
        // cells; bit 0 is a constant 1 so "has group" is group != 0
        // (the previous `| 1L` over gy's low bit merged vertically
        // adjacent cells into one group)
        (gx << 33) | ((gy & 0xffffffffL) << 1) | 1L
      } else 0L

    // extra-precision scale bits for LINES (reference
    // FeatureRenderer.java:262-269): store at 2^scale resolution so
    // rounding cannot create artificial endpoint intersections before
    // line merging; unscaled at final write. 14 bits represent tile
    // coords (4096 × 2 buffer × 2 zigzag) so scale caps at 31-14.
    val scale =
      if (simplified.isInstanceOf[org.locationtech.jts.geom.LineString] ||
          simplified.isInstanceOf[org.locationtech.jts.geom.MultiLineString])
        math.min(31 - 14, math.max(spec.maxzoom, 14) - z)
      else 0
    TileSlicer.slice(simplified, z, spec.bufferPx, scale).map { s =>
      Rendered(
        tile_id = TileCoord.encodeHilbert(s.x, s.y, z),
        layer = spec.layer,
        sort_key = spec.sortKey,
        feature_id = spec.id,
        geom_type = s.geomType,
        commands = s.commands,
        attrs = attrs,
        group = group,
        group_limit = if (group != 0) spec.labelGridLimit else 0,
        scale = scale)
    }
  }

  /** Build FeatureSpec geometry: lon/lat JTS geometry -> world WKB. */
  def worldWkb(lonLat: Geometry): Array[Byte] = Geo.toWkb(Geo.latLonToWorld(lonLat))
}
