package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Way splitting at shared nodes (reference
 * `reader/osm/OsmWaySplitter.java` + `OsmReader.java:439-450`):
 * find nodes referenced by >= 2 distinct ways, split each way at those
 * nodes into segments (split node duplicated as both segment
 * endpoints) — the road-network intersection splitter.
 *
 * Spark shape: explode(nodes) -> count distinct ways per node ->
 * semi-join the hot nodes back (broadcast when small) -> per-way
 * flatMap split. One shuffle for the count, one broadcast back.
 */
object WaySplitter {

  /** ways(way_id BIGINT, nodes ARRAY<BIGINT>) ->
    * (way_id, seg_idx, nodes). */
  def splitAtSharedNodes(ways: DataFrame): DataFrame = {
    val spark = ways.sparkSession
    import spark.implicits._

    val sharedNodes = ways
      .select(col("way_id"), explode(col("nodes")).as("node"))
      .distinct() // a node twice in ONE way is not an intersection
      .groupBy(col("node"))
      .agg(count(lit(1)).as("ways"))
      .where(col("ways") >= 2)
      .select(col("node"))

    // broadcast the (usually small) intersection set; for planet-scale
    // inputs replace with a join + mapGroups, same semantics
    val shared = sharedNodes.as[Long].collect().toSet
    val bcast = spark.sparkContext.broadcast(shared)

    ways.select(col("way_id"), col("nodes"))
      .as[(Long, Seq[Long])]
      .flatMap { case (wayId, nodes) =>
        val cut = bcast.value
        val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        nodes.zipWithIndex.foreach { case (n, i) =>
          cur += n
          val interior = i > 0 && i < nodes.length - 1
          if (interior && cut.contains(n) && cur.length >= 2) {
            segs += cur.toSeq
            cur = scala.collection.mutable.ArrayBuffer(n)
          }
        }
        if (cur.length >= 2) segs += cur.toSeq
        segs.zipWithIndex.map { case (s, i) => (wayId, i, s) }
      }
      .toDF("way_id", "seg_idx", "nodes")
  }
}
