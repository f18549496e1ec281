package graft

import graft.engine.{Docs, Pipeline, Relations}
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.ConcurrentHashMap

object ResilienceSpec {
  // cross-task registry of partitions we already crashed once
  val crashed = new ConcurrentHashMap[Int, Boolean]()
}

class ResilienceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("pipeline survives a task failure (executor-loss analog, lineage retry)") {
    ResilienceSpec.crashed.clear()
    val docs = Docs.docs(spark, "/root/testdata/sf0.001")
    val profile = new Pipeline.GraftProfile(3, 3, 3)
    val kv = Pipeline.renderedFromDocs(docs, profile, rebalance = 4)
    // inject one crash per partition attempt 0 downstream of the render
    val flaky = kv.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (TaskContext.get().attemptNumber() == 0 && pid == 1 &&
        ResilienceSpec.crashed.putIfAbsent(pid, true) == null) {
        throw new RuntimeException("injected task failure")
      }
      it
    }
    val tiles = graft.engine.TileAssembler.assemble(flaky, profile, 4, gzipTiles = false)
    val n = tiles.count() // must succeed via task retry
    // identical result to the non-flaky run
    val clean = Pipeline.tiles(docs, profile, 4, gzipTiles = false).count()
    assert(n == clean)
  }

  test("salted aggregation is exact under task re-execution (deterministic salt)") {
    ResilienceSpec.crashed.clear()
    // skewed input: one hot key carrying 90% of rows, 8 partitions
    val base = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 7}", i.toLong))).toDF("k", "v").repartition(8)
    val flakySchema = base.schema
    val flaky = base.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      if (TaskContext.get().attemptNumber() == 0 && pid % 3 == 1 &&
        ResilienceSpec.crashed.putIfAbsent(1000 + pid, true) == null) {
        throw new RuntimeException("injected task failure mid-aggregate")
      }
      it
    }(org.apache.spark.sql.Encoders.row(flakySchema))
    val salted = graft.engine.Salt.aggregate(flaky, Seq("k"),
      Seq(graft.engine.Salt.sumOf(col("v"), "s"), graft.engine.Salt.countAll("n"),
        graft.engine.Salt.maxOf(col("v"), "hi")), buckets = 8)
    val direct = base.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"), max(col("v")).as("hi"))
    assert(salted.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }

  test("relation transitive closure with super-relations and a cycle") {
    val memberships = Seq(
      (10L, 100L), // way 10 in relation 100
      (11L, 100L),
      (100L, 200L), // relation 100 in super-relation 200
      (200L, 300L), // and deeper
      (300L, 200L)) // CYCLE 200 <-> 300
      .toDF("member_id", "relation_id")
    val closure = Relations.transitiveClosure(memberships, maxDepth = 10)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    // way 10 reaches 100, 200, 300
    assert(closure.filter(_._1 == 10L).map(_._2) == Set(100L, 200L, 300L))
    // cycle terminates: 200 reaches 300 and (via cycle) itself exactly once
    assert(closure.filter(_._1 == 200L).map(_._2) == Set(300L, 200L))
    assert(closure.filter(_._1 == 300L).map(_._2) == Set(200L, 300L))
  }

  test("closure local fast path == distributed doubling, rows and depths") {
    // mixed fixture straddling both regimes: a deep chain (depth 40 >
    // maxDepth fuse), a 7-cycle, and a fan-in forest
    val edges =
      (1L to 40L).map(i => (i, i + 1)) ++            // chain
        (100L to 106L).map(i => (i, if (i == 106L) 100L else i + 1)) ++ // cycle
        (200L to 299L).map(i => (i, 200L + (i % 7))) // fan-in (incl. self at 200)
    val df = edges.toDF("member_id", "relation_id")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Int)].collect().sorted.toSeq
    val local = norm(Relations.transitiveClosure(df, maxDepth = 12))
    val dist = norm(Relations.transitiveClosure(df, maxDepth = 12, localSolveMaxEdges = 0))
    assert(local == dist, "local fast path must replay the distributed doubling exactly")
  }
}
