package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins EvalOps.aucPpm: the histogram rank-sum equals the O(n²)
  * pairwise Mann–Whitney definition (ties = half-pairs) on randomized
  * data, and the three canonical anchors — perfect separation, reversed
  * separation, and all-tied — hit 1e6, 0, and exactly 500000. */
class EvalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = EvalOps.aucPpm(rows.toDF("score", "label"), col("score"), col("label"))
      .collect().head
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
  }

  /** O(n²) reference: count won pairs twice + tied pairs once. */
  private def reference(rows: Seq[(Long, Boolean)]): Long = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    u2 * 1000000L / (2L * pos.size * neg.size)
  }

  test("perfect, reversed, and tied separation anchor at 1e6, 0, 500000") {
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    assert(auc(perfect)._3.contains(1000000L))
    val reversed = perfect.map { case (s, l) => (s, !l) }
    assert(auc(reversed)._3.contains(0L))
    val tied = Seq((5L, true), (5L, true), (5L, false))
    assert(auc(tied) == ((2L, 1L, Some(500000L))))
  }

  test("degenerate single-class input yields null, not a crash") {
    assert(auc(Seq((1L, true), (2L, true))) == ((2L, 0L, None)))
    assert(auc(Seq((1L, false))) == ((0L, 1L, None)))
  }

  test("matches the pairwise reference on randomized data with heavy ties") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val rows = Seq.fill(200)(
        (rnd.nextInt(12).toLong, rnd.nextBoolean())) // 12 buckets => many ties
      val (p, n, got) = auc(rows)
      assert(p == rows.count(_._2) && n == rows.count(!_._2))
      assert(got.contains(reference(rows)), s"trial $trial")
    }
  }
}
