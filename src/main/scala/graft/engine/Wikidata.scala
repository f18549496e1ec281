package graft.engine

import graft.model.SourceFeature
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Wikidata translations join (reference `util/Wikidata.java` +
 * `util/Translations.java`): features whose tags carry a
 * `wikidata=Q...` id gain `name:xx` tags from a translations side
 * table. The reference fetches the table over HTTP and caches it as
 * JSON; here the table is any DataFrame of
 * `(qid string, names map<string,string>)` — at scale it is a dim
 * table, so the join BROADCASTS it and the big feature side never
 * shuffles.
 */
object Wikidata {

  /**
   * Left-join translations into the feature tag maps. Existing tags
   * win over wikidata-derived ones (the reference only fills gaps).
   */
  def attachTranslations(features: Dataset[SourceFeature],
                         translations: DataFrame,
                         qidCol: String = "qid",
                         namesCol: String = "names"): Dataset[SourceFeature] = {
    val spark = features.sparkSession
    import spark.implicits._
    val wd = translations.select(
      col(qidCol).cast("string").as("__qid"),
      col(namesCol).cast("map<string,string>").as("__names"))
      // one row per qid: duplicate translation rows (re-ingested
      // snapshots) would MULTIPLY every matching feature through the
      // left join, double-drawing it in every tile
      .dropDuplicates("__qid")
    features.toDF()
      .join(broadcast(wd), col("tags").getItem("wikidata") === col("__qid"), "left")
      .select(col("doc_id"), col("source"), col("geom"),
        when(col("__names").isNull, col("tags"))
          .otherwise(map_concat(
            map_filter(transform_keys(col("__names"), (k, _) => concat(lit("name:"), k)),
              (k, _) => !map_contains_key(col("tags"), k)),
            col("tags"))).as("tags"),
        col("span_sig"), col("relations"))
      .as[SourceFeature]
  }
}
