package graft.operators

/** Pixel-level image kernels over uncompressed 24-bit BMP blobs — the
  * one mainstream raster format fully decodable with no codec library
  * (plain little-endian headers + BGR rows, public BITMAPINFOHEADER
  * layout), so unlike the PNG/JPEG seam (pipeline.Externals) the decode
  * here is REAL byte parsing and the downstream perceptual hash is a
  * genuine pixel computation.
  *
  * Average hash (aHash): downsample to an 8×8 grid by nearest-neighbor
  * (sample at y = i·h div 8, x = j·w div 8 — pure integer coordinates),
  * threshold each sample against the integer mean of the 64 samples
  * (strict >, mean = sum div 64), and pack the 64 bits as two BIGINT
  * halves (bit b = 8·i + j; lo = b < 32, hi = b ≥ 32 — two non-negative
  * longs avoid the sign bit and give Hamming distance as two bit_count
  * XORs in any engine). Near-dup images agree on most bits; banding on
  * the hi half (the simhash-prefix discipline) keeps the candidate join
  * linear at corpus scale.
  */
object ImageOps {

  /** Decode a 24bpp bottom-up BMP to (width, height, row-major TOP-DOWN
    * gray pixels, gray = (r + g + b) div 3). Returns None for blobs that
    * are not plain 24bpp BMPs (wrong magic, compressed, truncated) — the
    * probe-guard rule: malformed input must not throw inside a task. */
  def decodeBmp24Gray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(10)
    val w = le32(18)
    val h = le32(22) // positive = bottom-up storage (the common case)
    if (le16(28) != 24 || le32(30) != 0 || w <= 0 || h <= 0) return None
    // dataOff is attacker-controlled: a negative (or in-header) claim
    // passes the total-size guard below arithmetically and then
    // indexes the array NEGATIVELY — an uncaught throw inside the
    // caller's task. Pixel data cannot start before the 54-byte
    // header of the plain-BITMAPINFOHEADER class this decoder speaks.
    if (dataOff < 54) return None
    // and 3*w must not wrap Int (w > ~715M corrupts the stride guard);
    // any actually-valid image satisfies stride*h <= file length, which
    // already implies w far below this bound
    if (w > (Int.MaxValue - 3) / 3) return None
    val stride = ((3 * w + 3) / 4) * 4
    if (dataOff.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (h - 1 - y) * stride // flip to top-down
      var x = 0
      while (x < w) {
        val o = srcRow + 3 * x
        val gray = ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3
        out(y * w + x) = gray
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** 8×8 average hash of decoded gray pixels → (hi, lo) 32-bit halves in
    * non-negative longs. See the object scaladoc for the exact bit
    * conventions (they are the oracle contract). */
  def aHash(w: Int, h: Int, gray: Array[Int]): (Long, Long) = {
    val v = new Array[Int](64)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        v(8 * i + j) = gray((i * h / 8) * w + (j * w / 8))
        j += 1
      }
      i += 1
    }
    val mean = v.sum / 64
    var hi = 0L
    var lo = 0L
    var bIdx = 0
    while (bIdx < 64) {
      if (v(bIdx) > mean) {
        if (bIdx < 32) lo |= 1L << bIdx else hi |= 1L << (bIdx - 32)
      }
      bIdx += 1
    }
    (hi, lo)
  }
}
