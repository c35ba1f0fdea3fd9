package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins IntervalOps.mergeIntervals' island semantics: overlap-or-touch
  * merges, NESTED intervals fold via the prior-rows running max (not
  * lag-of-end), keys never interleave, and a brute-force reference
  * implementation agrees on randomized inputs. */
class IntervalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def merge(rows: Seq[(String, Int, Int)]): Seq[(String, Int, Int, Long)] = {
    import spark.implicits._
    IntervalOps.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
      .toSeq
  }

  /** Brute-force reference: sort, sweep, merge when s <= running max. */
  private def reference(rows: Seq[(String, Int, Int)]): Seq[(String, Int, Int, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      val islands = sorted.foldLeft(List.empty[(Int, Int, Long)]) {
        case (acc, (s, e)) => acc match {
          case (hs, he, n) :: tail if s <= he => (hs, math.max(he, e), n + 1) :: tail
          case _ => (s, e, 1L) :: acc
        }
      }
      islands.reverse.map { case (s, e, n) => (k, s, e, n) }
    }.sortBy(t => (t._1, t._2))

  test("overlap, touch, gap, and nesting merge correctly") {
    // [0,5) overlaps [3,8); [8,10) TOUCHES and merges; [12,15) gaps.
    assert(merge(Seq(("a", 0, 5), ("a", 3, 8), ("a", 8, 10), ("a", 12, 15))) ==
      Seq(("a", 0, 10, 3L), ("a", 12, 15, 1L)))
    // Nesting: [0,100) swallows [10,20); [30,40) continues the SAME
    // island through the running max even though it doesn't touch its
    // immediate predecessor [10,20).
    assert(merge(Seq(("a", 0, 100), ("a", 10, 20), ("a", 30, 40))) ==
      Seq(("a", 0, 100, 3L)))
  }

  test("keys are independent; singletons and duplicates survive") {
    assert(merge(Seq(("a", 0, 5), ("b", 3, 8))) ==
      Seq(("a", 0, 5, 1L), ("b", 3, 8, 1L)))
    assert(merge(Seq(("a", 1, 2), ("a", 1, 2))) == Seq(("a", 1, 2, 2L)))
  }

  test("matches the brute-force reference on randomized inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val rows = Seq.fill(60)((
        s"k${rnd.nextInt(4)}", {
          val s = rnd.nextInt(50); s
        }, 0)).map { case (k, s, _) => (k, s, s + rnd.nextInt(12)) }
      assert(merge(rows) == reference(rows), s"input: $rows")
    }
  }
}
