package graft.engine

import graft.geo.Simplify
import org.locationtech.jts.geom.Coordinate
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/**
 * Graph-based linestring merger — the per-tile line post-process
 * operator (reference behavior: `util/LoopLineMerger.java`; see also
 * the write-up linked there). Input lines live on the MVT integer grid
 * (tile-local extent-4096 coords), which doubles as the snap grid, so
 * no precision model is needed.
 *
 * Phases (same order as the reference):
 *   1. node the input at shared points (midpoint intersections split)
 *   2. merge degree-2 chains
 *   3. break loops shorter than `loopMinLength`: where several edge
 *      paths connect the same two nodes within the budget, keep only
 *      the shortest (bounded A* search)
 *   4. remove short "hair" stubs (< stubMinLength, free end or loop),
 *      cascading re-merge
 *   5. simplify each edge between junctions (junction points pinned),
 *      then drop duplicate edges
 *   6. optionally merge the straightest continuations through 3+-way
 *      junctions (largest angle pairs first)
 *   7. drop remaining edges shorter than `minLength`
 *
 * Runs inside the tile assembler's per-tile group, so it is a pure
 * list-in/list-out function; distribution comes from tile parallelism.
 */
object LineMerger {

  case class Params(
      minLength: Double = 0.0,
      loopMinLength: Double = 0.0,
      stubMinLength: Double = 0.0,
      tolerance: Double = -1.0,
      mergeStrokes: Boolean = false)

  type Pt = (Int, Int)

  def merge(lines: Seq[Array[Pt]], p: Params): Seq[Array[Pt]] =
    new Merger(p).run(lines)

  private final class Node(val pt: Pt) {
    val edges = ArrayBuffer.empty[Edge]
    def distTo(o: Node): Double = {
      val dx = (o.pt._1 - pt._1).toDouble
      val dy = (o.pt._2 - pt._2).toDouble
      math.sqrt(dx * dx + dy * dy)
    }
  }

  /** Half-edge: stored in `from.edges` pointing away from `from`; its
    * twin lives in `to.edges`. Loops keep ONLY the forward half (a node
    * never holds both an edge and its twin — reference invariant). */
  private final class Edge(val from: Node, val to: Node, var coords: ArrayBuffer[Pt],
                           var length: Double, val main: Boolean) {
    var twin: Edge = _
    var removed = false
    def isLoop: Boolean = from eq to
    def remove(): Unit = if (!removed) {
      removed = true; twin.removed = true
      from.edges -= this
      to.edges -= twin
    }
    /** Outgoing direction at `from` (first segment angle). */
    def dirOut: Double = {
      val a = coords(0); val b = coords(1)
      math.atan2((b._2 - a._2).toDouble, (b._1 - a._1).toDouble)
    }
  }

  private def mkEdge(from: Node, to: Node, coords: ArrayBuffer[Pt], length: Double): Edge = {
    val e = new Edge(from, to, coords, length, main = true)
    val r = new Edge(to, from, coords.reverse, length, main = false)
    e.twin = r; r.twin = e
    e
  }

  private def pathLength(pts: collection.Seq[Pt]): Double = {
    var len = 0.0
    var i = 0
    while (i < pts.length - 1) {
      val dx = (pts(i + 1)._1 - pts(i)._1).toDouble
      val dy = (pts(i + 1)._2 - pts(i)._2).toDouble
      len += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    len
  }

  private final class Merger(p: Params) {
    private val nodes = ArrayBuffer.empty[Node]
    private val nodeAt = mutable.HashMap.empty[Pt, Node]

    private def nodeOf(pt: Pt): Node =
      nodeAt.getOrElseUpdate(pt, { val n = new Node(pt); nodes += n; n })

    def run(lines: Seq[Array[Pt]]): Seq[Array[Pt]] = {
      buildGraph(nodeLines(lines))
      degreeTwoMergeAll()
      if (p.loopMinLength > 0) { breakLoops(); degreeTwoMergeAll() }
      if (p.stubMinLength > 0) removeShortStubs() // re-merges internally
      if (p.tolerance >= 0) { simplifyEdges(); removeDuplicateEdges(); degreeTwoMergeAll() }
      if (p.mergeStrokes) { strokeMerge(); degreeTwoMergeAll() }
      if (p.minLength > 0) {
        nodes.foreach(n => n.edges.toList.foreach(e => if (e.length < p.minLength) e.remove()))
      }
      // collect surviving edges once each: a non-loop main edge lives at
      // its from-node (twin is non-main); a loop may survive as either
      // half but only one half is ever stored
      val out = ArrayBuffer.empty[Array[Pt]]
      nodes.foreach(_.edges.foreach(e =>
        if (!e.removed && (e.main || e.isLoop)) out += e.coords.toArray))
      out.toSeq
    }

    /** Split input lines at points used by more than one line (or twice
      * within one), so every intersection becomes a graph node. */
    private def nodeLines(lines: Seq[Array[Pt]]): Seq[ArrayBuffer[Pt]] = {
      val cleaned = lines.map { l =>
        val b = ArrayBuffer.empty[Pt]
        l.foreach(pt => if (b.isEmpty || b.last != pt) b += pt) // drop 0-length segments
        b
      }.filter(_.length >= 2)
      val useCount = mutable.HashMap.empty[Pt, Int]
      cleaned.foreach { l =>
        l.foreach(pt => useCount(pt) = useCount.getOrElse(pt, 0) + 1)
        // interior == endpoint of same line counts double already via loop
      }
      val out = ArrayBuffer.empty[ArrayBuffer[Pt]]
      cleaned.foreach { l =>
        var start = 0
        var i = 1
        while (i < l.length) {
          val isNode = i == l.length - 1 || useCount(l(i)) > 1
          if (isNode) {
            out += l.slice(start, i + 1)
            start = i
          }
          i += 1
        }
      }
      out.toSeq
    }

    private def buildGraph(segs: Seq[ArrayBuffer[Pt]]): Unit = {
      segs.foreach { seg =>
        val from = nodeOf(seg.head)
        val to = nodeOf(seg.last)
        // duplicate-edge check: an existing edge at `from` to the same
        // node with identical coords (either orientation)
        val dup = from.edges.exists(e => (e.to eq to) && (e.coords == seg || e.coords == seg.reverse))
        if (!dup) {
          val e = mkEdge(from, to, seg, pathLength(seg))
          from.edges += e
          if (from ne to) to.edges += e.twin
        }
      }
    }

    private def degreeTwoMergeAll(): Unit = nodes.foreach(degreeTwoMerge)

    /** Merge the two edges at a degree-2 node into one (unless either
      * is a loop); returns the merged edge if a merge happened. */
    private def degreeTwoMerge(node: Node): Edge = {
      if (node.edges.length == 2) {
        val a = node.edges(0); val b = node.edges(1)
        if (!a.isLoop && !b.isLoop && (a ne b.twin)) return mergeTwoEdges(node, a, b)
      }
      null
    }

    /** Both edges point away from `node`; result runs a.to -> node -> b.to. */
    private def mergeTwoEdges(node: Node, e1: Edge, e2: Edge): Edge = {
      // prefer to keep original direction of the main half where possible
      val (a, b) = if (e1.main) (e2, e1) else (e1, e2)
      node.edges -= a; node.edges -= b
      val coords = ArrayBuffer.empty[Pt]
      coords ++= a.coords.reverse
      coords ++= b.coords.view.slice(1, b.coords.length)
      val c = mkEdge(a.to, b.to, coords, a.length + b.length)
      a.to.edges -= a.twin
      b.to.edges -= b.twin
      a.to.edges += c
      if (a.to ne b.to) b.to.edges += c.twin
      c
    }

    /** Where multiple edge paths connect a node pair within the loop
      * budget, keep only the shortest path's first edge. */
    private def breakLoops(): Unit = {
      nodes.foreach { node =>
        if (node.edges.length > 1) {
          node.edges.toList.foreach { current =>
            if (node.edges.contains(current)) {
              val loops = node.edges.toList.flatMap { other =>
                val d = other.length +
                  shortestDistance(other.to, current.to, exclude = node,
                    maxLength = p.loopMinLength - other.length)
                if (d <= p.loopMinLength) Some((other, d)) else None
              }
              if (loops.length > 1) {
                val min = loops.minBy(_._2)._1
                loops.foreach { case (e, _) => if (e ne min) e.remove() }
              }
            }
          }
        }
      }
    }

    /** Bounded A* over the edge graph (euclidean heuristic). */
    private def shortestDistance(start: Node, end: Node, exclude: Node, maxLength: Double): Double = {
      if (start eq end) return 0.0
      if (start eq exclude) return Double.PositiveInfinity
      val best = mutable.HashMap.empty[Node, Double]
      val frontier = mutable.PriorityQueue.empty[(Double, Double, Node)](
        Ordering.by[(Double, Double, Node), Double](_._1).reverse)
      frontier.enqueue((start.distTo(end), 0.0, start))
      while (frontier.nonEmpty) {
        val (_, len, cur) = frontier.dequeue()
        if (cur eq end) return len
        cur.edges.foreach { e =>
          val nb = e.to
          if (nb ne exclude) {
            val nd = len + e.length
            if (nd < best.getOrElse(nb, Double.PositiveInfinity)) {
              best(nb) = nd
              val f = nd + nb.distTo(end)
              if (f <= maxLength) frontier.enqueue((f, nd, nb))
            }
          }
        }
      }
      Double.PositiveInfinity
    }

    private def isShortStub(e: Edge): Boolean =
      e != null && !e.removed && e.length < p.stubMinLength &&
        (e.from.edges.length == 1 || e.to.edges.length == 1 || e.isLoop)

    private def removeShortStubs(): Unit = {
      val pq = mutable.PriorityQueue.empty[Edge](Ordering.by[Edge, Double](_.length).reverse)
      nodes.foreach(_.edges.foreach(e => if (isShortStub(e)) pq.enqueue(e)))
      while (pq.nonEmpty) {
        val e = pq.dequeue()
        if (!e.removed) {
          if (isShortStub(e)) e.remove()
          val m1 = degreeTwoMerge(e.from)
          if (m1 != null) pq.enqueue(m1)
          if (e.from.edges.length == 1 && isShortStub(e.from.edges.head))
            pq.enqueue(e.from.edges.head)
          if (e.from ne e.to) {
            val m2 = degreeTwoMerge(e.to)
            if (m2 != null) pq.enqueue(m2)
            if (e.to.edges.length == 1 && isShortStub(e.to.edges.head))
              pq.enqueue(e.to.edges.head)
          }
        }
      }
    }

    /** DP-simplify each edge between junctions; junction endpoints stay
      * fixed (DP always keeps endpoints), so connections never break. */
    private def simplifyEdges(): Unit = {
      val collapsed = ArrayBuffer.empty[Edge]
      nodes.foreach(_.edges.foreach { e =>
        if (e.main && !e.removed) {
          val cs = e.coords.map { case (x, y) => new Coordinate(x.toDouble, y.toDouble) }.toArray
          val simp = Simplify.douglasPeucker(cs, p.tolerance, ring = false)
            .map(c => (math.round(c.x).toInt, math.round(c.y).toInt))
          val dedup = ArrayBuffer.empty[Pt]
          simp.foreach(pt => if (dedup.isEmpty || dedup.last != pt) dedup += pt)
          if (dedup.length < 2) collapsed += e
          else {
            e.coords = dedup
            e.twin.coords = dedup.reverse
            e.length = pathLength(dedup)
            e.twin.length = e.length
          }
        }
      })
      collapsed.foreach(_.remove())
    }

    private def removeDuplicateEdges(): Unit = {
      nodes.foreach { node =>
        val toRemove = ArrayBuffer.empty[Edge]
        var i = 0
        while (i < node.edges.length) {
          val a = node.edges(i)
          var j = i + 1
          while (j < node.edges.length) {
            val b = node.edges(j)
            if ((b.to eq a.to) && a.coords == b.coords) toRemove += b
            j += 1
          }
          i += 1
        }
        toRemove.foreach(_.remove())
      }
    }

    /** At 3+-way junctions, join the straightest pairs (largest angle
      * between outgoing directions first), greedily and disjointly. */
    private def strokeMerge(): Unit = {
      nodes.foreach { node =>
        val edges = node.edges.toList
        if (edges.length >= 2) {
          val pairs = for {
            i <- edges.indices; j <- (i + 1) until edges.length
            if edges(i) ne edges(j).twin
          } yield {
            val diff = math.abs(normAngle(edges(i).dirOut - edges(j).dirOut))
            (edges(i), edges(j), diff)
          }
          val taken = mutable.HashSet.empty[Edge]
          pairs.sortBy(-_._3).foreach { case (a, b, _) =>
            if (!taken(a) && !taken(b) && !a.removed && !b.removed &&
                node.edges.contains(a) && node.edges.contains(b)) {
              mergeTwoEdges(node, a, b)
              taken += a; taken += b
            }
          }
        }
      }
    }
  }

  @inline private def normAngle(a0: Double): Double = {
    var a = a0
    while (a > math.Pi) a -= 2 * math.Pi
    while (a < -math.Pi) a += 2 * math.Pi
    a
  }
}
