package graft

import graft.engine.{FastDeflate, Mvt}
import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch static-Huffman DEFLATE encoder (r6: replaces zlib
  * for tile-sized gzip payloads) verified against the JDK's Inflater —
  * an independent implementation, so a wire-format bug cannot
  * self-verify through our own gunzip alone. */
class FastDeflateSpec extends AnyFunSuite {

  private def inflateRaw(b: Array[Byte], expectLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b)
    val out = new Array[Byte](math.max(expectLen, 1))
    var off = 0
    while (!inf.finished() && off < out.length) off += inf.inflate(out, off, out.length - off)
    assert(inf.finished(), "deflate stream did not terminate")
    inf.end()
    java.util.Arrays.copyOf(out, off)
  }

  test("adversarial shapes round-trip through the JDK inflater") {
    val rnd = new java.util.Random(7)
    def check(tag: String, in: Array[Byte]): Unit = {
      val back = inflateRaw(FastDeflate.deflate(in), in.length)
      assert(java.util.Arrays.equals(back, in), s"$tag len=${in.length}")
    }
    check("empty", Array.emptyByteArray)
    check("one", Array[Byte](42))
    check("two", Array[Byte](1, 2))
    check("min-match", Array[Byte](9, 9, 9))
    (0 until 300).foreach { t =>
      val n = rnd.nextInt(if (t % 10 == 0) 100000 else 3000)
      val b = new Array[Byte](n)
      t % 4 match {
        case 0 => rnd.nextBytes(b) // incompressible: 8/9-bit literals only
        case 1 => // short periods: overlapping (dist < len) matches
          var i = 0; while (i < n) { b(i) = (i % (1 + rnd.nextInt(7))).toByte; i += 1 }
        case 2 => // long runs: max-length (258) matches and code 285
          var i = 0; while (i < n) { b(i) = (if (rnd.nextInt(10) < 8) 7 else rnd.nextInt(256)).toByte; i += 1 }
        case 3 => // repeated phrases at varied distances
          val phrase = new Array[Byte](1 + rnd.nextInt(40)); rnd.nextBytes(phrase)
          var i = 0; while (i < n) { b(i) = phrase(i % phrase.length); i += 1 }
      }
      check(s"fuzz$t", b)
    }
    // >32KB-distance duplicate must be re-emitted, not matched
    val big = new Array[Byte](1 << 18)
    rnd.nextBytes(big)
    System.arraycopy(big, 0, big, 200000, 60000)
    check("big", big)
  }

  test("Mvt.gzip round-trips on both the fast and the zlib path") {
    val rnd = new java.util.Random(3)
    // below and above FastGzipMaxLen (32 KB): both implementations
    for (n <- Seq(0, 1, 100, 5000, 32 * 1024, 32 * 1024 + 1, 200000)) {
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      assert(java.util.Arrays.equals(Mvt.gunzip(Mvt.gzip(b)), b), s"n=$n")
    }
  }
}
