package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins PageRankOps' fixed-point arithmetic against a driver-side
  * reference implementation, the regular-graph invariant (exactly-
  * divisible degrees lose zero micro-units, so ranks stay at 1e6), and
  * sink/source semantics (pure sinks appear in the output; sources
  * bottom out at the (1-d) base). */
class PageRankOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side reference: same integer update, plain Maps. */
  private def reference(edges0: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = edges0.distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("complete graph K5: ranks stay exactly 1e6 (divisible degrees, zero floor loss)") {
    val k5 = for (i <- 0L to 4L; j <- 0L to 4L if i != j) yield (i, j)
    assert(run(k5) == (0L to 4L).map(_ -> 1000000L).toMap)
  }

  test("chain a->b->c: source decays to base, sink holds upstream mass; matches reference") {
    val chain = Seq((1L, 2L), (2L, 3L))
    val got = run(chain)
    assert(got == reference(chain, 3))
    assert(got(1L) == 150000L) // source: base only after iter 1
    assert(got.keySet == Set(1L, 2L, 3L)) // pure sink 3 present
  }

  test("matches the driver-side reference on a randomized graph, several iteration counts") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == reference(edges, iters), s"iters=$iters")
  }

  test("duplicate edges collapse; null endpoints dropped") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (null, 5L), (5L, null))
      .toDF("s", "d")
    val got = PageRankOps.pageRank(df, "s", "d", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after dedup this is the symmetric pair: both ranks exactly 1e6
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }
}
