package graft.engine

import graft.geo.{Geo, RingAssembler}
import graft.model.SourceFeature
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate

/**
 * The OSM reader pipeline over a PBF entity frame — the engine-side
 * analog of the reference's two-pass `reader/osm/OsmReader.java`,
 * re-expressed as distributed joins instead of a shared
 * `LongLongMap`:
 *
 *  - pass 1 side tables are just projections of the entity frame
 *    (node locations, relation memberships);
 *  - pass 2's way materialization is `posexplode(refs)` ⋈ node
 *    locations → sorted `collect_list` — ONE shuffle join + one
 *    aggregation, both keyed on node/way ids (no driver state, scales
 *    with the cluster);
 *  - multipolygon relations (`OsmReader.java:922-962`,
 *    `OsmMultipolygon.java:97-199`) group member-way coordinate
 *    arrays per relation and run the pure ring-stitching
 *    [[RingAssembler]] inside `mapGroups`-style aggregation.
 *
 * Usage: `Osm.sourceFeatures(spark.read.format("osmpbf").load(path))`
 * feeds the same profile/render/assemble pipeline as the docs input.
 */
object Osm {

  /** Keys whose presence makes a closed way a polygon (a compact
    * version of the reference's generated `multipolygon.json` table,
    * `reader/osm/OsmReader.java` canBePolygon). `area=yes/no`
    * overrides in both directions. */
  private val PolygonKeys = Set(
    "building", "landuse", "natural", "leisure", "amenity", "boundary",
    "place", "shop", "tourism", "aeroway", "military", "building:part")

  def isPolygonWay(tags: Map[String, String], closed: Boolean): Boolean = {
    if (!closed) false
    else tags.get("area") match {
      case Some("no") => false
      case Some("yes") => true
      case _ => tags.keysIterator.exists(PolygonKeys)
    }
  }

  /**
   * way_id, tags, coords (ordered lon/lat pairs).
   *
   * Location-padded ways (LocationsOnWays, the osmium
   * add-locations-to-ways convention) already carry their node
   * coordinates — those project DIRECTLY with no join, which at
   * planet scale removes the engine's biggest shuffle (the ~8×10⁹-row
   * refs ⋈ nodes exchange). Unpadded ways take the pass-2 shape: ONE
   * shuffle join (refs ⋈ node ids) + one aggregation.
   */
  def wayCoords(entities: DataFrame): DataFrame = {
    val ways = entities.filter(col("kind") === "way")
      .select(col("id").as("way_id"), col("tags"), col("refs"),
        col("ref_lats"), col("ref_lons"))
      .where(size(col("refs")) >= 2)

    val padded = ways
      .where(size(col("ref_lats")) === size(col("refs")))
      .select(col("way_id"), col("tags"),
        transform(arrays_zip(col("ref_lons"), col("ref_lats")),
          x => struct(x.getField("ref_lons").as("lon"), x.getField("ref_lats").as("lat")))
          .as("coords"))

    val nodes = entities.filter(col("kind") === "node")
      .select(col("id").as("ref"), col("lat"), col("lon"))
    val joined = ways
      .where(size(col("ref_lats")) =!= size(col("refs")))
      .select(col("way_id"), col("tags"), size(col("refs")).as("want"),
        posexplode(col("refs")).as(Seq("pos", "ref")))
      .join(nodes, "ref")
      .groupBy(col("way_id"))
      .agg(
        first(col("tags")).as("tags"),
        transform(array_sort(collect_list(struct(col("pos"), col("lon"), col("lat")))),
          x => struct(x.getField("lon").as("lon"), x.getField("lat").as("lat"))).as("coords"),
        count(lit(1)).as("got"),
        first(col("want")).as("want"))
      // ways referencing nodes missing from the extract drop, like the
      // reference's incomplete-way handling
      .where(col("got") === col("want"))
      .select(col("way_id"), col("tags"), col("coords"))

    padded.unionByName(joined)
  }

  /** Encoder-friendly lon/lat pair (matches the `coords` struct by name). */
  case class LonLat(lon: Double, lat: Double)

  /**
   * Entity frame → typed SourceFeatures:
   * tagged nodes as points, non-polygon ways as lines, polygon ways
   * as polygons, `type=multipolygon` relations ring-stitched from
   * member ways (member ways without own tags are suppressed as
   * standalone features).
   */
  def sourceFeatures(entities: DataFrame): Dataset[SourceFeature] = {
    val spark = entities.sparkSession
    import spark.implicits._

    val points = entities.filter(col("kind") === "node" && size(col("tags")) > 0)
      .select(col("id"), col("lat"), col("lon"), col("tags"))
      .as[(Long, Double, Double, Map[String, String])]
      .map { case (id, lat, lon, tags) =>
        val g = Geo.factory.createPoint(new Coordinate(lon, lat))
        SourceFeature(s"node/$id", "osm", Geo.toWkb(g), tags, id)
      }

    val rels = entities.filter(col("kind") === "relation")
    val mpMembers = rels
      .where(try_element_at(col("tags"), lit("type")) === "multipolygon")
      .select(col("id").as("rel_id"), col("tags").as("rel_tags"),
        posexplode(arrays_zip(col("member_types"), col("member_ids"), col("member_roles")))
          .as(Seq("mpos", "m")))
      .select(col("rel_id"), col("rel_tags"),
        col("m.member_types").as("mtype"), col("m.member_ids").as("mid"),
        col("m.member_roles").as("role"))
      .where(col("mtype") === "way" && col("role").isin("outer", "inner", ""))

    // cached because BOTH the way-features and relation-features
    // branches read it; Spark's LRU evicts the blocks under memory
    // pressure (MEMORY_AND_DISK keeps re-reads off the join), and the
    // session-lifetime pin is bounded by one materialized frame per
    // sourceFeatures call — callers running many ingests per session
    // should unpersist the returned plan's cache via Catalog.clearCache
    val wc = wayCoords(entities)
    wc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // member ways with no tags of their own exist only to carry the
    // relation's geometry
    val memberWayIds = mpMembers.select(col("mid").as("way_id")).distinct()

    val wayFeatures = wc
      .join(memberWayIds.withColumn("is_member", lit(true)), Seq("way_id"), "left")
      .where(col("is_member").isNull || size(col("tags")) > 0)
      .select(col("way_id"), col("tags"), col("coords"))
      .as[(Long, Map[String, String], Seq[LonLat])]
      .flatMap { case (id, tags, coords) =>
        if (tags.isEmpty) Iterator.empty
        else {
          val arr = coords.map(c => new Coordinate(c.lon, c.lat)).toArray
          val closed = arr.length >= 4 && arr.head.equals2D(arr.last)
          val g =
            if (isPolygonWay(tags, closed)) {
              // snap at OSM's own 1e-7-degree resolution (NOT the tile-space
              // default, which would collapse building-sized rings)
              val fixed = graft.geo.PolygonFixer.snapAndFix(
                Geo.factory.createPolygon(arr),
                new org.locationtech.jts.geom.PrecisionModel(1e7))
              if (fixed == null || fixed.isEmpty) null else fixed
            } else Geo.factory.createLineString(arr)
          if (g == null) Iterator.empty
          else Iterator.single(SourceFeature(s"way/$id", "osm", Geo.toWkb(g), tags, id))
        }
      }

    val relFeatures = mpMembers
      .join(wc.select(col("way_id").as("mid"), col("coords")), "mid")
      .groupBy(col("rel_id"))
      .agg(first(col("rel_tags")).as("tags"), collect_list(col("coords")).as("segs"))
      .as[(Long, Map[String, String], Seq[Seq[LonLat]])]
      .flatMap { case (id, tags, segs) =>
        val segments = segs.map(s => s.map(c => new Coordinate(c.lon, c.lat)).toArray)
        val g = try RingAssembler.assemble(segments) catch { case _: Exception => null }
        if (g == null || g.isEmpty) Iterator.empty
        else Iterator.single(SourceFeature(s"relation/$id", "osm", Geo.toWkb(g),
          tags - "type", id))
      }

    points.unionByName(wayFeatures).unionByName(relFeatures)
  }

  /** `.osm.pbf` → encoded tiles: the reference's end-to-end flow on
    * the Spark engine. */
  def tiles(spark: SparkSession, pbfPath: String,
            profile: Profile = new Pipeline.GraftProfile(),
            numPartitions: Int = 32): Dataset[graft.model.TileBytes] = {
    val entities = spark.read.format("osmpbf").load(pbfPath)
    Pipeline.tilesFromFeatures(sourceFeatures(entities), profile, numPartitions)
  }
}
