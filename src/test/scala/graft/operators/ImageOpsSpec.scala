package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pixel-level pins for the BMP decode + average-hash family: the
  * decoder against a hand-written bitmap (bottom-up row flip, row
  * padding, gray averaging), aHash against a hand-packed bit pattern,
  * and the registered mm_image_ahash query end-to-end (exact renamed
  * dups at Hamming 0, the planted one-sample perturbation at Hamming 1,
  * malformed blobs dropped). */
class ImageOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Minimal 24bpp bottom-up BMP writer (the fixture generator's
    * layout), pixels given TOP-DOWN as (r, g, b). */
  private def bmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((3 * w + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) {
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
      }
      (3 * w until stride).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  test("decodeBmp24Gray: bottom-up flip, row padding, channel averaging; " +
      "malformed blobs decode to None") {
    // 2x2, distinct per-pixel channels: gray = (r+g+b)/3 truncated
    val bytes = bmp(2, 2, (x, y) => (10 * (y * 2 + x) + 1, 10 * (y * 2 + x) + 2,
      10 * (y * 2 + x) + 4))
    val Some((w, h, gray)) = ImageOps.decodeBmp24Gray(bytes)
    assert((w, h) == ((2, 2)))
    // (1+2+4)/3=2, (11+12+14)/3=12, ... TOP-DOWN row-major despite
    // bottom-up storage
    assert(gray.toSeq == Seq(2, 12, 22, 32))
    assert(ImageOps.decodeBmp24Gray(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageOps.decodeBmp24Gray("not a bmp".getBytes.padTo(60, 0.toByte)).isEmpty)
    // truncated pixel data must not throw
    assert(ImageOps.decodeBmp24Gray(bytes.take(bytes.length - 4)).isEmpty)
  }

  test("decodeBmp24Gray: hostile header claims decode to None, never " +
      "throw or over-allocate (r15 sweep)") {
    val good = bmp(2, 2, (_, _) => (1, 2, 4))
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = good.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(off, v)
      c
    }
    // negative pixel-data offset: passed the total-size guard
    // arithmetically and indexed the array NEGATIVELY pre-fix
    assert(ImageOps.decodeBmp24Gray(patched(10, -1000000000)).isEmpty)
    // offset inside the 54-byte header
    assert(ImageOps.decodeBmp24Gray(patched(10, 8)).isEmpty)
    // width whose 3*w wraps Int: corrupted the stride guard pre-fix
    assert(ImageOps.decodeBmp24Gray(patched(18, 0x60000000)).isEmpty)
    // the unpatched fixture still decodes
    assert(ImageOps.decodeBmp24Gray(good).isDefined)
  }

  test("aHash: hand-packed bits — strict > mean threshold, hi/lo split at " +
      "grid row 4") {
    // 8x8 'image' (w=h=8 so sampling is the identity): row i all i*10.
    // mean = (0+10+...+70)*8/64 = 35 -> rows 4..7 (values 40..70) set.
    val gray = Array.tabulate(64)(k => (k / 8) * 10)
    val (hi, lo) = ImageOps.aHash(8, 8, gray)
    assert(lo == 0L) // rows 0..3 all below mean
    assert(hi == 0xFFFFFFFFL) // rows 4..7 all above
    // one pixel at the mean must NOT set its bit (strict >)
    val g2 = gray.updated(0, 35)
    val (_, lo2) = ImageOps.aHash(8, 8, g2)
    assert((lo2 & 1L) == 0L)
  }

  test("mm_image_ahash end-to-end: renamed exact dups at Hamming 0, the " +
      "one-sample perturbation at Hamming 1, cross-seed pairs absent") {
    val got = graft.SparkEntry.queries("mm_image_ahash")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val exact = (1 to 5).map(s =>
      (s"img_s${s}_v0.bmp", s"img_s${s}_v1.bmp", 0)).toSet
    assert(exact.subsetOf(got), s"missing exact-dup pairs in $got")
    assert(got.contains(("img_s1_v0.bmp", "img_s1_v2.bmp", 1)))
    // every surviving pair is within one seed (banding never crosses)
    got.foreach { case (a, b, _) =>
      assert(a.split("_")(1) == b.split("_")(1), s"cross-seed pair ($a, $b)")
    }
  }
}
