package graft.text

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL (non-stub) multimodal codec behind the l12 contract: 24-bit
  * uncompressed Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER — the
  * public format spec), exercised end-to-end by l12_bmp_decode.
  *
  * encode() renders a payload's bytes as a 7-pixel-wide 24bpp image —
  * width 7 is deliberate: a 21-byte pixel row forces the format's 4-byte
  * row padding (24-byte stride), so the decoder's stride arithmetic is
  * load-bearing, not vacuously aligned. Pixel i (row-major, top-down)
  * encodes v = payload(i) (0 past the end) as BGR channels
  * (B=v, G=(v+i)%256, R=(v·131+3)%256), rows stored BOTTOM-UP as the
  * format requires for positive heights.
  *
  * decode() is a genuine parser: it reads magic/offset/width/height/bpp
  * from the little-endian headers, recomputes the padded stride, un-flips
  * the bottom-up rows, skips padding, and folds per-channel integer sums
  * plus an ORDER-SENSITIVE poly-hash over (B,G,R) in top-down row-major
  * order — any stride, flip, or offset mistake changes the hash, which
  * the DuckDB oracle reproduces from first principles (BmpCodecSpec also
  * proves tampering with row order changes the hash while tampering with
  * padding bytes does not).
  */
object BmpCodec {
  val Width = 7
  val Bpp = 24
  private val HeaderSize = 54 // 14-byte file header + 40-byte info header
  private val Mod = 1000000007L

  final case class Decoded(width: Long, height: Long, bpp: Long,
      bSum: Long, gSum: Long, rSum: Long, pixelHash: Long)

  private def stride(w: Int): Int = (w * 3 + 3) / 4 * 4

  def encode(payload: Array[Byte]): Array[Byte] = {
    val len = payload.length
    val h = math.max(1, (len + Width - 1) / Width)
    val rowSize = stride(Width)
    val size = HeaderSize + rowSize * h
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(HeaderSize)
    buf.putInt(40).putInt(Width).putInt(h).putShort(1).putShort(Bpp.toShort)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up: the file's first stored row is the image's last
    while (y >= 0) {
      var x = 0
      while (x < Width) {
        val i = y * Width + x
        val v = if (i < len) payload(i) & 0xff else 0
        buf.put(v.toByte)                   // B
        buf.put(((v + i) % 256).toByte)     // G
        buf.put(((v * 131 + 3) % 256).toByte) // R
        x += 1
      }
      var p = Width * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  def decode(bmp: Array[Byte]): Decoded = {
    require(bmp.length >= HeaderSize && bmp(0) == 'B' && bmp(1) == 'M',
      s"not a BMP (${bmp.length} bytes)")
    val buf = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    require(bpp == Bpp, s"unsupported bpp $bpp (only 24bpp uncompressed)")
    require(w > 0 && h > 0, s"top-down/degenerate BMP ($w x $h) not supported")
    val rowSize = stride(w)
    require(bmp.length >= pixelOffset + rowSize * h,
      s"truncated pixel array: ${bmp.length} < ${pixelOffset + rowSize * h}")
    var bSum = 0L; var gSum = 0L; var rSum = 0L; var hash = 0L
    var y = 0
    while (y < h) {
      val o = pixelOffset + (h - 1 - y) * rowSize // un-flip bottom-up storage
      var x = 0
      while (x < w) {
        val b = bmp(o + 3 * x) & 0xff
        val g = bmp(o + 3 * x + 1) & 0xff
        val r = bmp(o + 3 * x + 2) & 0xff
        bSum += b; gSum += g; rSum += r
        hash = (hash * 131 + b) % Mod
        hash = (hash * 131 + g) % Mod
        hash = (hash * 131 + r) % Mod
        x += 1
      }
      y += 1
    }
    Decoded(w.toLong, h.toLong, bpp.toLong, bSum, gSum, rSum, hash)
  }
}
