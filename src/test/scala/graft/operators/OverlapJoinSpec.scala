package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins RangeJoinOps.intervalOverlapJoin: matches the brute-force
  * overlap definition on randomized interval sets (half-open, keyed),
  * emits each pair EXACTLY once regardless of how many bins the pair
  * shares (the owner-bin dedup), and treats touching intervals as
  * non-overlapping. */
class OverlapJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def join(as: Seq[(String, Long, Long, Long)],
      bs: Seq[(String, Long, Long, Long)], binW: Long): Seq[(Long, Long)] = {
    import spark.implicits._
    RangeJoinOps.intervalOverlapJoin(
        as.toDF("k", "a_id", "a_s", "a_e"), bs.toDF("k", "b_id", "b_s", "b_e"),
        "k", "a_s", "a_e", "b_s", "b_e", binW)
      .collect().map(r => (r.getLong(1), r.getAs[Long]("b_id"))).toSeq
  }

  private def reference(as: Seq[(String, Long, Long, Long)],
      bs: Seq[(String, Long, Long, Long)]): Seq[(Long, Long)] =
    for ((ka, ia, sa, ea) <- as; (kb, ib, sb, eb) <- bs
         if ka == kb && sa < ea && sb < eb && sa < eb && sb < ea)
      yield (ia, ib)

  test("matches brute force on randomized keyed intervals, several bin widths") {
    val rnd = new scala.util.Random(21)
    def gen(n: Int, base: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(400).toLong
      (s"k${rnd.nextInt(5)}", base + i, s, s + 1 + rnd.nextInt(60))
    }
    val as = gen(120, 1000)
    val bs = gen(120, 2000)
    val want = reference(as, bs).sorted
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val got = join(as, bs, w)
      assert(got.size == got.distinct.size, s"w=$w emitted duplicate pairs")
      assert(got.sorted == want, s"w=$w diverged from brute force")
    }
  }

  test("negative coordinates bin to the LEFT (floor, not truncate-toward-zero)") {
    // The operator doc's claim: bin(-1) must be -1 for width 16, not 0 —
    // truncating division would map [-16, 0) onto bin 0 and pairs
    // straddling the origin would silently meet in the wrong owner bin
    // (or twice). Randomized straddle set vs brute force.
    val rnd = new scala.util.Random(33)
    def gen(n: Int, base: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(200).toLong - 100 // spans the origin
      (s"k${rnd.nextInt(3)}", base + i, s, s + 1 + rnd.nextInt(40))
    }
    val as = gen(80, 1000)
    val bs = gen(80, 2000)
    val want = reference(as, bs).sorted
    for (w <- Seq(1L, 16L, 64L)) {
      val got = join(as, bs, w)
      assert(got.size == got.distinct.size, s"w=$w emitted duplicate pairs")
      assert(got.sorted == want, s"w=$w diverged from brute force on negatives")
    }
  }

  test("touching half-open intervals do not match; nested ones do") {
    val as = Seq(("k", 1L, 0L, 10L))
    val bs = Seq(("k", 2L, 10L, 20L), // touches: [0,10) vs [10,20)
      ("k", 3L, 2L, 5L), // nested
      ("x", 4L, 0L, 10L)) // other key
    assert(join(as, bs, 8L) == Seq((1L, 3L)))
  }

  test("invalid and null intervals drop out") {
    import spark.implicits._
    val a = Seq(("k", 1L, Some(5L), Some(3L)), ("k", 2L, None, Some(9L)),
      ("k", 3L, Some(0L), Some(4L)))
      .toDF("k", "a_id", "a_s", "a_e")
    val b = Seq(("k", 9L, 1L, 2L)).toDF("k", "b_id", "b_s", "b_e")
    val got = RangeJoinOps.intervalOverlapJoin(
      a, b, "k", "a_s", "a_e", "b_s", "b_e", 4L).collect()
    assert(got.map(_.getAs[Long]("a_id")).toSeq == Seq(3L))
  }
}
