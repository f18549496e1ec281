package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Way splitting at shared nodes (reference
 * `reader/osm/OsmWaySplitter.java` + `OsmReader.java:439-450`):
 * find nodes referenced by >= 2 distinct ways, split each way at those
 * nodes into segments (split node duplicated as both segment
 * endpoints) — the road-network intersection splitter.
 *
 * Spark shape — fully distributed, nothing collects to the driver:
 * explode(nodes) -> count distinct ways per node (shuffle 1) ->
 * equi-join the cut markers back onto the exploded positions
 * (shuffle 2, broadcast when the intersection set is small enough for
 * AQE to choose it) -> regroup per way (shuffle 3, sorted by position)
 * -> per-way segment split. Planet scale: road intersections are
 * O(100 M) longs — a driver-side set would be multi-GB, so the cut
 * markers stay a distributed column end to end.
 */
object WaySplitter {

  /** ways(way_id BIGINT, nodes ARRAY<BIGINT>) -> (way_id, cut_pos
    * ARRAY<INT>): per way, the sorted node positions that sit on a
    * node shared by >= 2 ways. Only ways with at least one shared
    * position appear. Positions may include endpoints — segmenting
    * callers apply the interior (0 < i < n-1) filter themselves. */
  def cutPositions(ways: DataFrame): DataFrame = {
    val exploded = ways
      .select(col("way_id"), posexplode(col("nodes")).as(Seq("idx", "node")))

    val sharedNodes = exploded
      .select(col("way_id"), col("node"))
      .distinct() // a node twice in ONE way is not an intersection
      .groupBy(col("node"))
      .agg(count(lit(1)).as("ways"))
      .where(col("ways") >= 2)
      .select(col("node"))

    exploded
      .join(sharedNodes, Seq("node"))
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(col("idx"))).as("cut_pos"))
  }

  /** ways(way_id BIGINT, nodes ARRAY<BIGINT>) ->
    * (way_id, seg_idx, nodes). */
  def splitAtSharedNodes(ways: DataFrame): DataFrame = {
    val spark = ways.sparkSession
    import spark.implicits._

    ways
      .join(cutPositions(ways), Seq("way_id"), "left")
      .select(col("way_id"), col("nodes"), col("cut_pos"))
      .as[(Long, Seq[Long], Seq[Int])]
      .flatMap { case (wayId, nodes, cutPosOrNull) =>
        val cuts = Option(cutPosOrNull).getOrElse(Seq.empty)
          .filter(i => i > 0 && i < nodes.length - 1).toSet
        val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
        nodes.zipWithIndex.foreach { case (n, i) =>
          cur += n
          if (cuts(i) && cur.length >= 2) {
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
