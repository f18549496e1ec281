package graft.engine

/**
 * From-scratch DEFLATE (RFC 1951) encoder specialized for the tile
 * encode hot path: one fixed-Huffman block, greedy LZ77 with a
 * GENERATION-TAGGED hash head table.
 *
 * Why not java.util.zip.Deflater: every independent gzip stream needs
 * a `reset()`, and zlib's deflateReset clears its 64 KB hash head
 * table — for a ~400-byte vector tile that memset dominates the whole
 * call (r6 probe: ~24 us/tile gzip vs ~10 us of actual encode). Here
 * the hash table is allocated once per thread and entries carry the
 * stream generation in the high bits, so "reset" is one counter
 * increment and per-stream cost scales with the INPUT, not the table.
 *
 * Scope: encoder only, single final block, static Huffman codes —
 * the standard fast-path trade (zlib BEST_SPEED uses static blocks
 * for small inputs too). Output is a valid RFC 1951 stream readable
 * by any inflater; [[Mvt.gzip]] wraps it in the gzip framing and
 * callers' round-trip tests decode it with the JDK's Inflater — an
 * independent implementation — so a wire bug cannot self-verify.
 * Compression ratio is within a few percent of BEST_SPEED on MVT
 * payloads (measured in the r6 probe); callers with big or
 * ratio-critical payloads keep the zlib path.
 */
object FastDeflate {

  private final val HashBits = 15
  private final val HashSize = 1 << HashBits
  private final val MinMatch = 3
  private final val MaxMatch = 258
  private final val MaxDist = 32768

  /** Per-thread match state: head table (position) + generation tag.
    * gen packs with position into one long: (gen << 32) | pos. */
  private final class State {
    val head = new Array[Long](HashSize)
    var gen = 0L
    var out = new Array[Byte](1 << 16)
    var outLen = 0 // bytes fully written
    var bitBuf = 0L // pending bits, LSB first
    var bitCnt = 0
    def nextGen(): Unit = { gen += 1L << 32 }
    def ensure(n: Int): Unit =
      if (outLen + n > out.length) out = java.util.Arrays.copyOf(out, math.max(out.length * 2, outLen + n))
    def writeBits(v: Int, n: Int): Unit = {
      bitBuf |= (v.toLong & ((1L << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) {
        ensure(1)
        out(outLen) = (bitBuf & 0xff).toByte
        outLen += 1
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def finishByte(): Unit = {
      if (bitCnt > 0) {
        ensure(1)
        out(outLen) = (bitBuf & 0xff).toByte
        outLen += 1
      }
      bitBuf = 0L
      bitCnt = 0
    }
  }

  private val statePool = ThreadLocal.withInitial[State](() => new State)

  /** Reverse the low n bits of v (Huffman codes are emitted MSB-first
    * inside the LSB-first bit stream). */
  private def rev(v: Int, n: Int): Int = {
    var x = v
    var r = 0
    var i = 0
    while (i < n) { r = (r << 1) | (x & 1); x >>= 1; i += 1 }
    r
  }

  // Fixed literal/length codes, pre-reversed for the bit writer:
  // lit 0-143 -> 8 bits 0x30+lit; 144-255 -> 9 bits 0x190+(lit-144);
  // len codes 256-279 -> 7 bits code-256; 280-287 -> 8 bits 0xC0+(code-280).
  private val litCode = new Array[Int](288)
  private val litBits = new Array[Int](288)
  locally {
    var i = 0
    while (i < 288) {
      val (c, n) =
        if (i < 144) (0x30 + i, 8)
        else if (i < 256) (0x190 + (i - 144), 9)
        else if (i < 280) (i - 256, 7)
        else (0xc0 + (i - 280), 8)
      litCode(i) = rev(c, n)
      litBits(i) = n
      i += 1
    }
  }

  // length -> (code, extraBits, extraVal) lookup for 3..258
  private val lenSym = new Array[Int](MaxMatch + 1)
  private val lenExtraBits = new Array[Int](MaxMatch + 1)
  private val lenExtraVal = new Array[Int](MaxMatch + 1)
  locally {
    val base = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
      35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
    val extra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
      3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
    var c = 0
    while (c < base.length) {
      val lo = base(c)
      val hi = if (c == base.length - 1) 258 else base(c + 1) - 1
      var l = lo
      while (l <= math.min(hi, MaxMatch)) {
        lenSym(l) = 257 + c
        lenExtraBits(l) = extra(c)
        lenExtraVal(l) = l - lo
        l += 1
      }
      c += 1
    }
    // code 285 (len 258) has 0 extra bits
    lenSym(258) = 285; lenExtraBits(258) = 0; lenExtraVal(258) = 0
  }

  // distance -> 5-bit fixed code (pre-reversed) + extra
  private val distBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577)
  private val distExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val distCodeRev = Array.tabulate(30)(c => rev(c, 5))

  private def distSym(d: Int): Int = {
    // binary search over the 30 bases (d in [1, 32768])
    var lo = 0
    var hi = 29
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (distBase(mid) <= d) lo = mid else hi = mid - 1
    }
    lo
  }

  private def hash3(b: Array[Byte], i: Int): Int = {
    val h = ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)
    (h * 0x9e3779b1) >>> (32 - HashBits)
  }

  /** Deflate `input` as one static-Huffman final block. Returns the
    * raw DEFLATE stream (no zlib/gzip framing). */
  def deflate(input: Array[Byte]): Array[Byte] = {
    val st = statePool.get()
    st.outLen = 0
    st.bitBuf = 0L
    st.bitCnt = 0
    st.nextGen()
    st.ensure(16 + input.length / 4)
    // block header: BFINAL=1, BTYPE=01 (static) — 3 bits LSB-first
    st.writeBits(1, 1)
    st.writeBits(1, 2)

    val n = input.length
    val head = st.head
    val gen = st.gen
    var i = 0
    while (i < n) {
      var matchLen = 0
      var matchDist = 0
      if (i + MinMatch <= n) {
        val h = hash3(input, i)
        val e = head(h)
        head(h) = gen | i.toLong
        if ((e & 0xffffffff00000000L) == gen) {
          val cand = (e & 0xffffffffL).toInt
          val dist = i - cand
          if (dist > 0 && dist <= MaxDist) {
            // extend match
            val maxL = math.min(MaxMatch, n - i)
            var l = 0
            while (l < maxL && input(cand + l) == input(i + l)) l += 1
            if (l >= MinMatch) { matchLen = l; matchDist = dist }
          }
        }
      }
      if (matchLen > 0) {
        val sym = lenSym(matchLen)
        st.writeBits(litCode(sym), litBits(sym))
        if (lenExtraBits(matchLen) > 0) st.writeBits(lenExtraVal(matchLen), lenExtraBits(matchLen))
        val ds = distSym(matchDist)
        st.writeBits(distCodeRev(ds), 5)
        if (distExtra(ds) > 0) st.writeBits(matchDist - distBase(ds), distExtra(ds))
        // insert hash heads inside the match (skip for long matches —
        // zlib BEST_SPEED-style "too_far" shortcut keeps this linear)
        val stop = math.min(i + matchLen, n - MinMatch)
        var j = i + 1
        while (j < stop) { head(hash3(input, j)) = gen | j.toLong; j += 1 }
        i += matchLen
      } else {
        val lit = input(i) & 0xff
        st.writeBits(litCode(lit), litBits(lit))
        i += 1
      }
    }
    // end-of-block symbol 256
    st.writeBits(litCode(256), litBits(256))
    st.finishByte()
    java.util.Arrays.copyOf(st.out, st.outLen)
  }
}
