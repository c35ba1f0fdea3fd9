package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Full Scala replay of the binary simhash pipeline — hex chunking, md5
  * parity votes, prefix blocking, Hamming verify — against the
  * registered mm_binary_simhash query (which authors its own fixture
  * tree, so the table dir is unused). */
class BinarySimhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("US-ASCII")).map("%02x".format(_)).mkString
  }

  private def sim16(bytes: Array[Byte]): Int = {
    val hx = bytes.map("%02x".format(_)).mkString
    val hs = (0 until hx.length / 8).map(j => md5hex(hx.substring(j * 8, j * 8 + 8)))
    (0 until 16).map { i =>
      val vote = hs.map(h => (h.charAt(i) % 2) * 2 - 1).sum
      if (vote >= 0) 1 << (15 - i) else 0
    }.sum
  }

  test("mm_binary_simhash matches the Scala replay of votes, blocks, and Hamming") {
    val got = graft.SparkEntry.queries("mm_binary_simhash")(spark, "/unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // replicate the fixture the query authors
    val files = (0 until 40).map { k =>
      val body = s"chunk-family-${k % 8}-payload-" * 6 + s"tail-$k"
      f"f$k%03d.bin" -> sim16(body.getBytes("US-ASCII"))
    }
    val want = (for {
      (fa, sa) <- files; (fb, sb) <- files
      if fa < fb && (sa >> 8) == (sb >> 8)
      h = Integer.bitCount(sa ^ sb) if h <= 3
    } yield (fa, fb, h)).sortBy(p => (p._1, p._2))
    assert(got == want)
    assert(want.nonEmpty, "the family fixture must produce near-dup pairs")
    // the fixture's bodies differ by one family char + tail, so SOME
    // same-family pair must land in the candidate set (votes nearly
    // identical); cross-family pairs may too — that is simhash, and the
    // replay equality above is the correctness pin.
    def fam(f: String) = f.drop(1).take(3).toInt % 8
    assert(got.exists { case (a, b, _) => fam(a) == fam(b) },
      "same-family binaries must be detected")
  }
}
