package graft.geo

/**
 * S2 cell-id encoding from scratch — the spherical hierarchical index
 * the north star names alongside the tile grid ("H3/S2 cell encoding").
 *
 * Implements the published S2 geometry algorithm (s2geometry.io docs +
 * the open-source library's documented cell-id layout): the unit
 * sphere projects onto 6 cube faces, each face carries a 30-level
 * quadtree laid out along a Hilbert curve, and a cell id packs
 * `face(3 bits) | hilbert position (2*level bits) | 1 | zeros` into a
 * uint64. The quadratic st↔uv transform matches the library's default
 * projection, so equal-level cells have near-equal area (≤2.1× spread)
 * everywhere on the globe — unlike mercator tiles, which degenerate at
 * the poles. That makes S2 the right bucketing key for GLOBAL spatial
 * joins (see [[graft.engine.SpatialJoin.radiusJoinS2]]).
 *
 * Two independent encoders are implemented — the 4-bits-per-step
 * lookup-table walk the library uses and a plain bit-by-bit Hilbert
 * state machine — and S2Spec asserts them identical over random
 * points; structural invariants (containment, parent/child, token
 * round trip, neighbor symmetry) pin the rest. Reference for role
 * (not code): planetiler keys its spatial work by web-mercator
 * `TileCoord`; S2 here serves the analogous role for joins that must
 * not distort at high latitude.
 *
 * Pure math on longs/doubles — executor-safe, codegen-friendly.
 */
object S2 {

  val MaxLevel = 30
  val MaxSize: Int = 1 << MaxLevel // cells per face edge at level 30
  private val PosBits = 2 * MaxLevel + 1 // 61: hilbert pos + trailing 1

  // ---------------- projections ----------------

  /** Quadratic st→uv transform (the library's default projection). */
  def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1)
    else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))

  /** Quadratic uv→st transform (inverse of [[stToUv]]). */
  def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u)
    else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** Cube face (0..5) containing unit vector (x,y,z): the axis with
    * the largest magnitude, +x,+y,+z → 0,1,2 and -x,-y,-z → 3,4,5. */
  def xyzToFace(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (az > ax && az > ay) 2 else if (ay > ax) 1 else 0
    axis match {
      case 0 => if (x < 0) 3 else 0
      case 1 => if (y < 0) 4 else 1
      case _ => if (z < 0) 5 else 2
    }
  }

  /** (u,v) face coordinates of (x,y,z), which must lie on `face`. */
  def validFaceXyzToUv(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }

  /** Unnormalized (x,y,z) of face coordinates (u,v) on `face`. */
  def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  // ---------------- hilbert tables ----------------

  private val SwapMask = 0x1
  private val InvertMask = 0x2
  /** pos → ij within one cell, per orientation (base order {0,1,3,2}). */
  private val PosToIj: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // axes swapped
    Array(3, 2, 0, 1), // bits inverted
    Array(3, 1, 0, 2)) // swapped + inverted
  private val PosToOrientation: Array[Int] =
    Array(SwapMask, 0, 0, InvertMask | SwapMask)
  private val IjToPos: Array[Array[Int]] = {
    val t = Array.fill(4)(new Array[Int](4))
    for (o <- 0 until 4; p <- 0 until 4) t(o)(PosToIj(o)(p)) = p
    t
  }

  // 4-bits-at-a-time tables: index = (i4 << 6) | (j4 << 2) | orientation,
  // value = (pos8 << 2) | nextOrientation (and the inverse for decode).
  private val LookupPos = new Array[Int](1 << 10)
  private val LookupIj = new Array[Int](1 << 10)
  private def initLookup(level: Int, i: Int, j: Int, origOrient: Int,
                         pos: Int, orient: Int): Unit =
    if (level == 4) {
      LookupPos((i << 6) | (j << 2) | origOrient) = (pos << 2) | orient
      LookupIj((pos << 2) | origOrient) = (i << 6) | (j << 2) | orient
    } else {
      var subPos = 0
      while (subPos < 4) {
        val ij = PosToIj(orient)(subPos)
        initLookup(level + 1, (i << 1) | (ij >> 1), (j << 1) | (ij & 1),
          origOrient, (pos << 2) | subPos, orient ^ PosToOrientation(subPos))
        subPos += 1
      }
    }
  initLookup(0, 0, 0, 0, 0, 0)
  initLookup(0, 0, 0, SwapMask, 0, SwapMask)
  initLookup(0, 0, 0, InvertMask, 0, InvertMask)
  initLookup(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)

  // ---------------- encode ----------------

  /** Leaf cell id of discrete face coordinates (face, i, j). */
  def fromFaceIj(face: Int, i: Int, j: Int): Long = {
    var n = face.toLong << (PosBits - 1)
    var bits = face & SwapMask
    var k = 7
    while (k >= 0) {
      bits |= ((i >> (k * 4)) & 0xf) << 6
      bits |= ((j >> (k * 4)) & 0xf) << 2
      bits = LookupPos(bits)
      n |= (bits >> 2).toLong << (k * 8)
      bits &= SwapMask | InvertMask
      k -= 1
    }
    n * 2 + 1
  }

  /** Independent bit-by-bit encoder (cross-check for [[fromFaceIj]]). */
  def fromFaceIjSlow(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orient = face & SwapMask
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = IjToPos(orient)(ij)
      pos = (pos << 2) | p
      orient ^= PosToOrientation(p)
      k -= 1
    }
    (face.toLong << PosBits) | pos << 1 | 1
  }

  private def clampIj(x: Int): Int = math.max(0, math.min(MaxSize - 1, x))

  /** Discrete coordinate of an st value: floor(st * 2^30), clamped. */
  def stToIj(s: Double): Int = clampIj(math.floor(s * MaxSize).toInt)

  /** Leaf cell id containing (lonDeg, latDeg). */
  def leafCellId(lonDeg: Double, latDeg: Double): Long = {
    val lon = math.toRadians(lonDeg); val lat = math.toRadians(latDeg)
    val cosLat = math.cos(lat)
    val x = math.cos(lon) * cosLat
    val y = math.sin(lon) * cosLat
    val z = math.sin(lat)
    val face = xyzToFace(x, y, z)
    val (u, v) = validFaceXyzToUv(face, x, y, z)
    fromFaceIj(face, stToIj(uvToSt(u)), stToIj(uvToSt(v)))
  }

  /** Cell id containing (lonDeg, latDeg) at `level` (0..30). */
  def cellId(lonDeg: Double, latDeg: Double, level: Int): Long =
    parent(leafCellId(lonDeg, latDeg), level)

  // ---------------- structure ----------------

  def face(id: Long): Int = (id >>> PosBits).toInt

  /** Lowest set bit — encodes the level. */
  def lsb(id: Long): Long = id & -id
  def lsbForLevel(level: Int): Long = {
    // guard the SQL-facing surface: a negative shift here would wrap
    // (1L << -2 == 1L << 62) and silently corrupt every downstream
    // join key built from the garbage id
    require(level >= 0 && level <= MaxLevel, s"S2 level out of range [0,$MaxLevel]: $level")
    1L << (2 * (MaxLevel - level))
  }

  def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def parent(id: Long, level: Int): Long = {
    val newLsb = lsbForLevel(level)
    (id & -newLsb) | newLsb
  }
  def parent(id: Long): Long = parent(id, level(id) - 1)

  /** First child (level+1) of a non-leaf cell. */
  def childBegin(id: Long): Long = { val l = lsb(id); id - l + (l >> 2) }

  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  /** True iff cell `a` contains cell `b` (unsigned id order). */
  def contains(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(rangeMin(a), b) <= 0 &&
      java.lang.Long.compareUnsigned(b, rangeMax(a)) <= 0

  /** (face, i, j, orientation) of a cell id's leaf-aligned position. */
  def toFaceIjOrientation(id: Long): (Int, Int, Int, Int) = {
    val f = face(id)
    var bits = f & SwapMask
    var i = 0; var j = 0
    var k = 7
    while (k >= 0) {
      // chunk 7 carries only the top 2 of the 30 ij bit-pairs
      val nbits = if (k == 7) 2 else 4
      bits |= (((id >>> (k * 8 + 1)) & ((1 << (2 * nbits)) - 1)).toInt) << 2
      bits = LookupIj(bits)
      i |= (bits >> 6) << (k * 4)
      j |= ((bits >> 2) & 0xf) << (k * 4)
      bits &= SwapMask | InvertMask
      k -= 1
    }
    // orientation correction for non-leaf cells whose size's log2 is odd
    val orient =
      if ((lsb(id) & 0x1111111111111110L) != 0) bits ^ SwapMask else bits
    (f, i, j, orient)
  }

  /** Cell center as (lonDeg, latDeg). The decoded (i, j) is a leaf
    * inside the cell (the curve-order center leaf), so flooring to
    * cell-size multiples yields the min corner; center = corner + half
    * a cell in si/ti space (half-leaf units over [0, 2*MaxSize]). */
  def centerLonLat(id: Long): (Double, Double) = {
    val (f, i, j, _) = toFaceIjOrientation(id)
    val sizeIj = (1L << (MaxLevel - level(id))).toInt
    val si = 2.0 * (i - (i % sizeIj)) + sizeIj
    val ti = 2.0 * (j - (j % sizeIj)) + sizeIj
    val u = stToUv(si / (2.0 * MaxSize))
    val v = stToUv(ti / (2.0 * MaxSize))
    val (x, y, z) = faceUvToXyz(f, u, v)
    val lon = math.toDegrees(math.atan2(y, x))
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    (lon, lat)
  }

  def isLeaf(id: Long): Boolean = (id & 1L) != 0

  /** Hilbert position (bits 1..60) — the per-face curve index. */
  def pos(id: Long): Long = (id >>> 1) & ((1L << (PosBits - 1)) - 1)

  // ---------------- tokens ----------------

  def token(id: Long): String = {
    if (id == 0) return "X"
    val hex = f"$id%016x"
    var end = hex.length
    while (end > 1 && hex.charAt(end - 1) == '0') end -= 1
    hex.substring(0, end)
  }

  def fromToken(t: String): Long =
    if (t == "X" || t == "x") 0L
    else java.lang.Long.parseUnsignedLong(t + "0" * (16 - t.length), 16)

  // ---------------- neighbors + covering ----------------

  /** Leaf id from (face, i, j) where i/j may fall off the face: wraps
    * onto the neighboring face via the linear projection (the wrap is
    * only ever by one cell, where linear and quadratic agree on the
    * shared edge). */
  def fromFaceIjWrap(face: Int, i: Int, j: Int): Long = {
    val ic = math.max(-1, math.min(MaxSize, i))
    val jc = math.max(-1, math.min(MaxSize, j))
    if (ic >= 0 && jc >= 0 && ic < MaxSize && jc < MaxSize) return fromFaceIj(face, ic, jc)
    val scale = 1.0 / MaxSize
    val limit = java.lang.Math.nextUp(1.0)
    val u = math.max(-limit, math.min(limit, scale * (2 * (ic - MaxSize / 2) + 1)))
    val v = math.max(-limit, math.min(limit, scale * (2 * (jc - MaxSize / 2) + 1)))
    val (x, y, z) = faceUvToXyz(face, u, v)
    val f2 = xyzToFace(x, y, z)
    val (u2, v2) = validFaceXyzToUv(f2, x, y, z)
    def linearStToIj(s: Double): Int = clampIj(math.floor(MaxSize / 2 * s + MaxSize / 2).toInt)
    fromFaceIj(f2, linearStToIj(u2), linearStToIj(v2))
  }

  /** The 4 edge neighbors of a cell, at the same level. */
  def edgeNeighbors(id: Long): Array[Long] = {
    val lvl = level(id)
    val (f, i, j, _) = toFaceIjOrientation(id)
    val size = (1L << (MaxLevel - lvl)).toInt
    Array(
      parent(fromFaceIjWrap(f, i, j - size), lvl),
      parent(fromFaceIjWrap(f, i + size, j), lvl),
      parent(fromFaceIjWrap(f, i, j + size), lvl),
      parent(fromFaceIjWrap(f, i - size, j), lvl))
  }

  // ONE shared geodesy constant: the cap-cover superset guarantee
  // depends on capCover and Mercator.metersBetween agreeing on the
  // sphere radius, so both must read the same value
  private def EarthRadiusMeters = Mercator.EarthRadiusMeters

  /** Max angular half-diagonal of any level-`lvl` cell (radians),
    * CONSERVATIVE. Cell diagonals do not shrink by exactly 2x per
    * level (the quadratic projection stretches cells near face
    * corners; the published max-diagonal metric derivative is
    * ~2.44/2^l for the full diagonal), so bound the half-diagonal by
    * 1.31/2^l — above the published constant at every level, and above
    * the level-0 face half-diagonal acos(1/sqrt(3)) ≈ 0.955. A
    * too-small bound here silently breaks the cap-cover SUPERSET
    * guarantee (caught by a wrong-nearest in the q68 gate at 15k
    * points before this constant was made conservative). */
  def maxHalfDiagRadians(lvl: Int): Double = 1.31 / (1L << lvl)

  /** Superset covering of a spherical cap: all level-`lvl` cells whose
    * CENTER lies within radius + the level's max half-diagonal of
    * (lonDeg, latDeg). Any cell intersecting the cap has its center
    * within that bound, so the result is a guaranteed superset — the
    * bucketing contract a bucket-join needs (exact verify downstream).
    * BFS over edge neighbors from the center cell; the accepted region
    * is connected because the predicate is a disc in center-distance. */
  def capCover(lonDeg: Double, latDeg: Double, radiusMeters: Double, lvl: Int): Array[Long] = {
    val maxAngle = radiusMeters / EarthRadiusMeters + maxHalfDiagRadians(lvl)
    def within(id: Long): Boolean = {
      val (lon2, lat2) = centerLonLat(id)
      angularDistance(lonDeg, latDeg, lon2, lat2) <= maxAngle
    }
    val start = cellId(lonDeg, latDeg, lvl)
    val seen = scala.collection.mutable.HashSet[Long](start)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val queue = scala.collection.mutable.Queue[Long](start)
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      if (within(c)) {
        out += c
        edgeNeighbors(c).foreach { n => if (seen.add(n)) queue.enqueue(n) }
      }
    }
    out.toArray.sorted
  }

  /** Central angle (radians) between two lon/lat points — THE haversine
    * the whole engine uses, expressed through [[Mercator.metersBetween]]
    * so the cap-cover superset contract and the join-side exact verify
    * can never drift apart (one formula, one radius). */
  def angularDistance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double =
    Mercator.metersBetween(lon1, lat1, lon2, lat2) / EarthRadiusMeters
}
