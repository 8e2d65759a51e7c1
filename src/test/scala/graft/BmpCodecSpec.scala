package graft

import graft.text.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** The l12 family's non-stub codec: the encoder must emit spec-conformant
  * 24bpp BMPs and the decoder must be an HONEST parser — header-driven,
  * stride-aware, bottom-up-unflipping — not a replay of the encoder's
  * arithmetic. The tamper tests pin that: row order changes the hash,
  * padding bytes do not.
  */
class BmpCodecSpec extends AnyFunSuite {
  private val Mod = 1000000007L

  /** First-principles expectation, independent of both encode and decode. */
  private def expected(payload: Array[Byte]): BmpCodec.Decoded = {
    val len = payload.length
    val h = math.max(1, (len + 6) / 7)
    var bS = 0L; var gS = 0L; var rS = 0L; var hash = 0L
    for (i <- 0 until 7 * h) {
      val v = if (i < len) payload(i) & 0xff else 0
      val (b, g, r) = (v, (v + i) % 256, (v * 131 + 3) % 256)
      bS += b; gS += g; rS += r
      hash = (hash * 131 + b) % Mod
      hash = (hash * 131 + g) % Mod
      hash = (hash * 131 + r) % Mod
    }
    BmpCodec.Decoded(7L, h.toLong, 24L, bS, gS, rS, hash)
  }

  test("encode emits a spec-conformant header with padded 24-byte stride") {
    val bmp = BmpCodec.encode("hello bmp world".getBytes("UTF-8")) // 15 bytes → h=3
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert(buf.getInt(2) == bmp.length)     // file size field
    assert(buf.getInt(10) == 54)            // pixel offset
    assert(buf.getInt(14) == 40)            // info header size
    assert(buf.getInt(18) == 7)             // width
    assert(buf.getInt(22) == 3)             // height
    assert((buf.getShort(28) & 0xffff) == 24)
    assert(bmp.length == 54 + 24 * 3)       // 21-byte rows padded to 24
  }

  test("decode(encode(p)) matches a first-principles recompute (incl. empty)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.empty[Byte],                         // h=1, seven zero pixels
      Array[Byte](7),                            // single byte
      "exactly twenty-one b".getBytes("UTF-8"),  // 20 bytes: one partial row
      Array.fill(21)(rnd.nextInt(256).toByte),   // exact row boundary
      Array.fill(200)(rnd.nextInt(256).toByte))  // many rows
    cases.foreach { p =>
      assert(BmpCodec.decode(BmpCodec.encode(p)) == expected(p),
        s"mismatch for payload of ${p.length} bytes")
    }
    assert(expected(Array.empty[Byte]).gSum == 21) // Σ i%256, i<7 — non-vacuous
  }

  test("tampering with row order changes the hash (decoder really un-flips)") {
    val p = (0 until 14).map(_.toByte).toArray // two distinct rows
    val bmp = BmpCodec.encode(p)
    val good = BmpCodec.decode(bmp).pixelHash
    val swapped = bmp.clone()
    // swap the two 24-byte stored rows
    System.arraycopy(bmp, 54, swapped, 54 + 24, 24)
    System.arraycopy(bmp, 54 + 24, swapped, 54, 24)
    assert(BmpCodec.decode(swapped).pixelHash != good,
      "row swap did not change the hash — decoder ignores row order")
  }

  test("tampering with padding bytes changes nothing (decoder really skips stride padding)") {
    val p = (0 until 14).map(_.toByte).toArray
    val bmp = BmpCodec.encode(p)
    val good = BmpCodec.decode(bmp)
    val dirty = bmp.clone()
    // pad bytes live at offsets 21..23 of each 24-byte row
    for (row <- 0 until 2; k <- 21 until 24) dirty(54 + row * 24 + k) = 0xff.toByte
    assert(BmpCodec.decode(dirty) == good,
      "padding bytes leaked into the decoded stats")
  }

  test("decode rejects non-BMP and truncated input") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val bmp = BmpCodec.encode(Array.fill(50)(1.toByte))
    intercept[IllegalArgumentException](BmpCodec.decode(bmp.take(60)))
  }
}
