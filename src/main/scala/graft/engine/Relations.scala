package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Relation-membership closure (reference `OsmReader.java:563-607`:
 * super-relations resolved recursively with a cycle guard): given
 * memberships (member_id, relation_id), compute every (member_id,
 * ancestor relation_id, depth) pair up to `maxDepth`.
 *
 * Spark shape: iterative self-join with a fixpoint check — each round
 * joins the frontier against the membership table (broadcast when the
 * relation table is small, which it is in practice: the reference
 * keeps all relation info in RAM). Cycles terminate via the depth
 * bound + distinct.
 */
object Relations {

  def transitiveClosure(memberships: DataFrame, maxDepth: Int = 10): DataFrame = {
    val base = memberships.select(
      col("member_id"), col("relation_id").as("ancestor_id"), lit(1).as("depth"))
      .distinct()
    var closure = base
    var frontier = base
    var depth = 1
    var done = false
    while (!done && depth < maxDepth) {
      val next = frontier.as("f")
        .join(broadcast(memberships.as("m")), col("f.ancestor_id") === col("m.member_id"))
        .select(col("f.member_id"), col("m.relation_id").as("ancestor_id"),
          (col("f.depth") + 1).as("depth"))
        // cycle guard: drop pairs already known at ANY depth
        .join(closure.select(col("member_id").as("km"), col("ancestor_id").as("ka")),
          col("member_id") === col("km") && col("ancestor_id") === col("ka"), "left_anti")
        .distinct()
        .localCheckpoint(eager = true) // truncate the growing lineage
      // emptiness probe, not a full count — one row decides the fixpoint
      if (next.isEmpty) done = true
      else {
        closure = closure.unionByName(next)
        frontier = next
        depth += 1
      }
    }
    closure
  }
}
