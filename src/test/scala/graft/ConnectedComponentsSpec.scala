package graft

import graft.dedup.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Large-regime connected components: the large-star/small-star rounds
  * must match driver union-find exactly and converge in O(log) rounds
  * even on high-DIAMETER graphs (where min-label propagation would
  * need one round per hop). */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def labelsOf(pairs: Seq[(Long, Long)], forceDistributed: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("da", "db")
    Dedup.duplicateClusters(df,
        localSolveMaxPairs = if (forceDistributed) 0L else Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of 500 nodes (diameter 500) collapses to one min-labeled star") {
    val chain = (0L until 499L).map(i => (i, i + 1))
    val dist = labelsOf(chain, forceDistributed = true)
    assert(dist.size == 500)
    assert(dist.values.toSet == Set(0L), "every node labeled by the component min")
  }

  test("mixed graph: distributed star rounds == driver union-find") {
    val rnd = new scala.util.Random(7)
    // several cliques, a chain, isolated pairs, shuffled + duplicated
    val cliques = (0 until 5).flatMap { c =>
      val base = 1000L * c
      val ids = (0 until 8).map(base + _)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }
    val chain = (0L until 60L).map(i => (7000L + i, 7000L + i + 1))
    val pairs0 = cliques ++ chain ++ Seq((9000L, 9001L), (9002L, 9003L))
    val pairs = rnd.shuffle(pairs0 ++ pairs0.map { case (a, b) => (b, a) })
    val dist = labelsOf(pairs, forceDistributed = true)
    val local = labelsOf(pairs, forceDistributed = false)
    assert(dist == local)
    assert(dist(1007L) == 1000L && dist(7060L) == 7000L && dist(9003L) == 9002L)
  }

  test("two-node and self-loop edges behave identically in both regimes") {
    val pairs = Seq((5L, 2L), (2L, 5L), (3L, 3L))
    val dist = labelsOf(pairs, forceDistributed = true)
    val local = labelsOf(pairs, forceDistributed = false)
    // the self-loop contributes no component in EITHER regime — node 3
    // gets no label row; {2,5} labels by 2
    assert(dist == Map(2L -> 2L, 5L -> 2L))
    assert(local == dist, "regime choice must not change self-pair semantics")
  }
}
