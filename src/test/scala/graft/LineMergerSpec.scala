package graft

import graft.engine.LineMerger
import graft.engine.LineMerger.Params
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's LoopLineMergerTest fixtures
  * (util/LoopLineMergerTest.java) against the graph merger. */
class LineMergerSpec extends AnyFunSuite {

  type L = Array[(Int, Int)]
  private def ls(pts: (Int, Int)*): L = pts.toArray

  /** Compare as sets of direction-normalized lines. */
  private def norm(l: L): Seq[(Int, Int)] = {
    val a = l.toSeq
    val b = a.reverse
    if (implicitly[Ordering[Iterable[(Int, Int)]]].lteq(a, b)) a else b
  }
  private def assertLines(got: Seq[L], want: Seq[L]): Unit =
    assert(got.map(norm).sortBy(_.headOption) == want.map(norm).sortBy(_.headOption))

  test("merges touching linestrings") {
    val out = LineMerger.merge(Seq(ls((10, 10), (20, 20)), ls((20, 20), (30, 30))), Params())
    assertLines(out, Seq(ls((10, 10), (20, 20), (30, 30))))
  }

  test("keeps two separate linestrings") {
    val in = Seq(ls((10, 10), (20, 20)), ls((30, 30), (40, 40)))
    assertLines(LineMerger.merge(in, Params()), in)
  }

  test("does not overcount duplicate edges") {
    val out = LineMerger.merge(
      Seq(ls((10, 10), (20, 20)), ls((20, 20), (30, 30)), ls((20, 20), (30, 30))), Params())
    assertLines(out, Seq(ls((10, 10), (20, 20), (30, 30))))
  }

  test("splits at shared midpoints before merging") {
    val out = LineMerger.merge(
      Seq(ls((10, 10), (20, 20), (30, 30)), ls((20, 20), (30, 30), (40, 40))), Params())
    assertLines(out, Seq(ls((10, 10), (20, 20), (30, 30), (40, 40))))
  }

  test("progressive stub removal cascades") {
    val out = LineMerger.merge(Seq(
      ls((0, 0), (5, 0)), // stub length 5 (kept: >= 4)
      ls((5, 0), (6, 0)), // mid piece
      ls((6, 0), (8, 0)), // stub length 2
      ls((5, 0), (5, 1)), // hair length 1
      ls((6, 0), (6, 1)) // hair length 1
    ), Params(stubMinLength = 4))
    assertLines(out, Seq(ls((0, 0), (5, 0), (6, 0), (8, 0))))
  }

  test("breaks small loops keeping the shortest path") {
    val out = LineMerger.merge(Seq(
      ls((10, 10), (20, 10), (30, 10), (30, 20), (40, 20)),
      ls((20, 10), (30, 20))
    ), Params(loopMinLength = 100))
    assertLines(out, Seq(ls((10, 10), (20, 10), (30, 20), (40, 20))))
  }

  test("keeps loops longer than loopMinLength") {
    val in = Seq(
      ls((10, 10), (20, 10), (30, 10), (30, 20), (40, 20)),
      ls((20, 10), (30, 20)))
    val out = LineMerger.merge(in, Params(loopMinLength = 10))
    // both arms survive: total loop length exceeds the budget
    assert(out.map(_.length).sum == in.map(_.length).sum ||
      out.flatMap(_.toSeq).toSet == in.flatMap(_.toSeq).toSet)
  }

  test("self-closing loops are stubs, removed by stubMinLength") {
    val out = LineMerger.merge(Seq(
      ls((1, -10), (1, 1), (1, 2), (0, 2), (0, 1), (1, 1), (10, 1))
    ), Params(stubMinLength = 5))
    assertLines(out, Seq(ls((1, -10), (1, 1), (10, 1))))
  }

  test("merge strokes connects straightest pairs through junctions") {
    val out = LineMerger.merge(Seq(
      ls((0, 0), (10, 0)), ls((10, 0), (20, 0)), // straight through
      ls((10, 0), (10, 10)) // side branch
    ), Params(mergeStrokes = true))
    assert(out.exists(l => norm(l) == Seq((0, 0), (10, 0), (20, 0))))
    assert(out.exists(l => norm(l) == Seq((10, 0), (10, 10))))
  }

  test("simplify pins junction points") {
    val out = LineMerger.merge(Seq(
      ls((0, 0), (5, 1), (10, 0)), // nearly straight, simplifies
      ls((10, 0), (15, 1), (20, 0)),
      ls((10, 0), (10, 10)) // makes (10,0) a junction
    ), Params(tolerance = 2))
    // every line still touches the junction
    assert(out.count(_.toSeq.contains((10, 0))) == 3)
    // interior near-collinear points got simplified away
    assert(out.exists(l => norm(l) == Seq((0, 0), (10, 0))))
  }
}
