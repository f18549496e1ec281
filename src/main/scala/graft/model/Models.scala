package graft.model

/**
 * Core row types flowing through the engine, mirroring the reference's
 * IR chain SourceFeature -> FeatureCollector.Feature -> RenderedFeature
 * -> TileFeatures (planetiler `reader/SourceFeature.java`,
 * `FeatureCollector.java:514-567`, `render/RenderedFeature.java`) but as
 * flat case classes with Spark `Encoder`s so every stage is a typed
 * `Dataset` and Tungsten keeps them off-heap.
 */

/** One span of an interleaved text+media document (the graft input). */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The graft input row: Iceberg-style interleaved document. */
case class Doc(doc_id: String, spans: Seq[Span])

/**
 * One relation membership attached to a source feature: the id, this
 * member's role, and the relation's stored tag info (the analog of the
 * reference's `OsmRelationInfo` + `RelationMember`, planetiler
 * `Profile.java:90-140`, `reader/osm/OsmReader.java:563-607`).
 */
case class RelMember(rel_id: Long, role: String, rel_tags: Map[String, String])

/**
 * A source feature extracted from a document: geometry as WKB plus the
 * open-world tag map; `span_sig` is the order-sensitive checksum of the
 * full span sequence (kind, text, media_ref, order) — the per-row
 * invariant that must survive every shuffle. `relations` carries the
 * relation memberships of OSM member ways (direct plus super-relation
 * ancestors), sorted by (rel_id, role) — empty for non-OSM sources.
 */
case class SourceFeature(
    doc_id: String,
    source: String,
    geom: Array[Byte], // WKB, lon/lat
    tags: Map[String, String],
    span_sig: Long,
    relations: Seq[RelMember] = Seq.empty)

/**
 * Logical output feature spec emitted by a profile (the analog of
 * `FeatureCollector.Feature`): what to render, at which zooms, with
 * which attributes.
 */
case class FeatureSpec(
    layer: String,
    geom: Array[Byte], // WKB, world coordinates in [0,1]
    id: Long,
    sortKey: Int,
    minzoom: Int,
    maxzoom: Int,
    attrs: Map[String, String],
    /** Per-zoom attr overrides: (minzoom threshold -> attrs merged in
      * from that zoom up), ascending — the ZoomFunction analog
      * (reference `util/ZoomFunction.java`). */
    zoomAttrs: Seq[(Int, Map[String, String])] = Seq.empty,
    bufferPx: Double = 4.0,
    minPixelSize: Double = 1.0,
    simplifyTolerancePx: Double = 0.0625, // 1/16 px default, like the reference
    labelGridPixelSize: Double = 0.0,
    labelGridLimit: Int = 0)

/**
 * One feature rendered into one tile at one zoom: the unit that gets
 * range-partitioned by Hilbert tile id. `commands` are MVT geometry
 * commands in tile-local extent-4096 integer space. `attrs` is the
 * PACKED key/value encoding (graft.engine.Attrs) — computed once per
 * feature and carried as opaque bytes so the 10-100x tile fan-out
 * never rebuilds per-row hash maps (string interning analog of the
 * reference's FeatureGroup.java:65-66).
 */
case class Rendered(
    tile_id: Long, // Hilbert-ordered tile id (TileCoord.encodeHilbert)
    layer: String,
    sort_key: Int,
    feature_id: Long,
    geom_type: Int, // 1=point 2=line 3=polygon (MVT enum)
    commands: Array[Int],
    attrs: Array[Byte],
    group: Long, // label-grid group key (0 = none)
    group_limit: Int,
    /** Extra-precision bits: commands are at 2^scale × extent-4096
      * resolution (lines only — unscaled at final tile write, after
      * merge post-processing; reference FeatureRenderer.java:262-269). */
    scale: Int = 0)

/** A fully encoded output tile. */
case class TileBytes(tile_id: Long, z: Int, x: Int, y: Int, bytes: Array[Byte], feature_count: Int, content_hash: Long)

/** Per-partition lineage record (north rule: per-partition metrics). */
case class PartitionLineage(stage: String, partition_id: Int, row_count: Long, min_key: Long, max_key: Long)
