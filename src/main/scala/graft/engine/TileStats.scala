package graft.engine

import graft.model.TileBytes
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Tileset summary statistics (reference
 * `util/TilesetSummaryStatistics.java`, `util/TileSizeStats.java`):
 * mergeable per-zoom aggregates + global top-N biggest tiles + archive
 * metadata. Classic partial-aggregation shapes — every one map-side
 * combines before the shuffle.
 */
object TileStats {

  /** Per-zoom size/feature statistics. */
  def perZoom(tiles: Dataset[TileBytes]): DataFrame =
    tiles.groupBy(col("z"))
      .agg(
        count(lit(1)).as("tiles"),
        sum(length(col("bytes"))).as("total_bytes"),
        min(length(col("bytes"))).as("min_bytes"),
        max(length(col("bytes"))).as("max_bytes"),
        sum(col("feature_count")).as("features"),
        countDistinct(col("content_hash")).as("unique_tiles"))
      .orderBy(col("z"))

  /** Global top-N biggest tiles (bounded priority queue analog =
    * orderBy + limit; Spark turns it into TakeOrdered). */
  def topBiggest(tiles: Dataset[TileBytes], n: Int = 10): DataFrame =
    tiles.select(col("z"), col("x"), col("y"), length(col("bytes")).as("bytes"))
      .orderBy(col("bytes").desc, col("z"), col("x"), col("y"))
      .limit(n)

  /** Weighted average tile size by a (z, x, y, weight) traffic table
    * (reference `util/TileWeights.java`): broadcast the weights. */
  def weightedAvgSize(tiles: Dataset[TileBytes], weights: DataFrame): DataFrame =
    tiles.join(broadcast(weights), Seq("z", "x", "y"), "left")
      .select(length(col("bytes")).as("b"), coalesce(col("weight"), lit(1.0)).as("w"))
      .agg((sum(col("b") * col("w")) / sum(col("w"))).as("weighted_avg_bytes"))

  /** Content-dedup summary: how many tiles share identical bytes
    * (ocean fills / repeated edges) — the mbtiles-compact ratio. */
  def dedupStats(tiles: Dataset[TileBytes]): DataFrame =
    tiles.groupBy(col("z"))
      .agg(count(lit(1)).as("tiles"), countDistinct(col("content_hash")).as("unique"))
      .withColumn("dedup_ratio", round(col("unique") / col("tiles"), 4))
      .orderBy(col("z"))

  /**
   * Per-layer attribute statistics from the feature specs (reference
   * `util/LayerAttrStats.java`): every attr key's inferred MVT type and
   * the zoom range it appears in. One partial-aggregating groupBy;
   * conflicting types collapse to "String" like the reference.
   */
  def layerAttrStats(specs: Dataset[graft.model.FeatureSpec]): DataFrame = {
    // One (key, value, first-visible zoom) row per static attr and per
    // zoomAttrs override that can actually appear inside the spec's
    // [minzoom, maxzoom]. Plain explodes + a where stay inside
    // whole-stage codegen; the earlier struct-building HOF chain
    // (transform/filter/concat) was interpreted per element and cost
    // ~2x the whole query. A spec with NO visible entry at all still
    // contributes a null-key row so its layer keeps a zoom range
    // (reference LayerAttrStats accepts features with no attributes).
    val df = specs.toDF()
    val statics = df
      .select(col("layer"), col("minzoom").as("mz"), col("maxzoom"),
        explode(col("attrs")).as(Seq("key", "value")))
    val zoomed = df
      .where(size(col("zoomAttrs")) > 0)
      .select(col("layer"), col("minzoom"), col("maxzoom"), explode(col("zoomAttrs")).as("za"))
      .select(col("layer"), greatest(col("minzoom"), col("za._1")).as("mz"), col("maxzoom"),
        explode(col("za._2")).as(Seq("key", "value")))
    // exactly the specs whose visible entry set is empty: no static
    // entry (attrs empty or minzoom past maxzoom) and no zoomAttrs
    // entry whose threshold still falls inside the zoom range
    // NULL attrs/zoomAttrs columns behave like empty (coalesce keeps
    // the predicate non-NULL): a spec with a NULL map still lands here
    // as a null-key row preserving its layer's zoom range — the old
    // explode_outer semantics — instead of vanishing when the
    // three-valued NULL logic makes the filter result NULL
    val attrless = df
      .where(!(coalesce(size(col("attrs")), lit(0)) > 0 && col("minzoom") <= col("maxzoom")) &&
        !coalesce(exists(col("zoomAttrs"), za =>
          size(za.getField("_2")) > 0 && za.getField("_1") <= col("maxzoom") &&
            col("minzoom") <= col("maxzoom")), lit(false)))
      .select(col("layer"), col("minzoom").as("mz"), col("maxzoom"),
        lit(null).cast("string").as("key"), lit(null).cast("string").as("value"))
    val typed = statics.unionByName(zoomed)
      .where(col("mz") <= col("maxzoom"))
      .unionByName(attrless)
      .select(col("layer"), col("key"), col("value"), col("mz"), col("maxzoom"))
      .withColumn("typ",
        when(col("value").isNull, lit(null).cast("string"))
          // exact equality (not the old rlike ^(true|false)$, whose $
          // also accepted a trailing line terminator — "true\n" is now
          // String, the stricter and intended classification)
          .when(col("value").isin("true", "false"), "Boolean")
          .when(col("value").rlike("^-?\\d+(\\.\\d+)?$"), "Number")
          .otherwise("String"))
    typed.groupBy(col("layer"), col("key"))
      .agg(
        // mixed types collapse to String; min!=max spots a mix without
        // countDistinct's Expand + double-aggregate plan (typ has only
        // 3 possible values, and min/max both ignore nulls like
        // countDistinct does, so the collapse semantics are identical)
        when(min(col("typ")) =!= max(col("typ")), "String")
          .otherwise(min(col("typ"))).as("type"),
        min(col("mz")).as("minzoom"),
        max(col("maxzoom")).as("maxzoom"))
      .orderBy(col("layer"), col("key"))
  }

  /** tilejson `vector_layers` with per-attr fields + zoom ranges.
    * Null-key rows (attr-less layers) contribute only to the zoom
    * range; the layer still appears with empty `fields`. */
  def vectorLayersJson(attrStats: DataFrame): String = {
    val rows = attrStats.collect()
    val byLayer = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    byLayer.map { case (layer, rs) =>
      val fields = rs.filter(!_.isNullAt(1)).sortBy(_.getString(1)).map { r =>
        s""""${r.getString(1)}":"${r.getString(2)}""""
      }.mkString(",")
      val mz = rs.map(_.getInt(3)).min
      val xz = rs.map(_.getInt(4)).max
      s"""{"id":"$layer","minzoom":$mz,"maxzoom":$xz,"fields":{$fields}}"""
    }.mkString("[", ",", "]")
  }

  /** Archive metadata JSON (tilejson-flavored). An empty tileset
    * emits integer 0/0 zoom bounds, never SQL-null interpolation. */
  def metadataJson(tiles: Dataset[TileBytes], name: String, layers: Seq[String]): String = {
    val zooms = tiles.agg(min(col("z")), max(col("z")), count(lit(1))).collect()(0)
    val (mz, xz, n) =
      if (zooms.isNullAt(0)) (0, 0, 0L)
      else (zooms.getInt(0), zooms.getInt(1), zooms.getLong(2))
    s"""{"name":"$name","minzoom":$mz,"maxzoom":$xz,""" +
      s""""tiles":$n,"vector_layers":[${layers.map(l => s"""{"id":"$l"}""").mkString(",")}]}"""
  }
}
