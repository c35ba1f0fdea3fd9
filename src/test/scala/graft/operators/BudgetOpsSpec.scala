package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Token-budget prefix cut (BudgetOps) and α=0.5 temperature
  * rebalancing (QuotaOps.sqrtTemperatureSample). The load-bearing
  * properties: the cut is the MAXIMAL prefix under the budget in
  * priority order; the result is invariant in nBuckets (the bucketing is
  * a parallelism knob, never a semantics knob); temperature quotas are
  * the exact integer formula totalN·isqrt(n_s) div Σ isqrt. */
class BudgetOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 40 docs, priority = portableHash(id), token counts 1..40. */
  private def docs = (1L to 40L).map(i => (i, i % 7 + 1))
    .toDF("id", "n_tok")

  private def cut(budget: Long, nBuckets: Int) =
    BudgetOps.tokenBudgetSample(docs,
        SketchOps.portableHash(col("id")), Seq(col("id")),
        col("n_tok"), budget, nBuckets = nBuckets)
      .select("id", "n_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("tokenBudgetSample: maximal prefix in priority order, budget never exceeded") {
    val m = SketchOps.hashM
    def pri(id: Long) = ((id % m + m) * 123456791L + 7919L) % m
    val budget = 60L
    val kept = cut(budget, 16)
    assert(kept.map(_._2).sum <= budget)
    // maximality + prefix-ness: replay the greedy prefix exactly
    val expected = (1L to 40L).map(i => (i, i % 7 + 1))
      .sortBy { case (id, _) => (pri(id), id) }
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1).takeWhile(_._3 <= budget)
      .map(t => (t._1, t._2)).sortBy(_._1)
    assert(kept.toSeq == expected)
  }

  test("tokenBudgetSample: result invariant in nBuckets") {
    val base = cut(60L, 1).toSeq
    for (nb <- Seq(2, 7, 64, 1024))
      assert(cut(60L, nb).toSeq == base, s"nBuckets=$nb diverged")
  }

  test("tokenBudgetSample: budget beyond the corpus keeps every row") {
    assert(cut(10000L, 8).length == 40)
  }

  test("tokenBudgetSample: zero budget keeps nothing (all rows cost > 0)") {
    assert(cut(0L, 8).isEmpty)
  }

  // ------------------------------------------- sqrtTemperatureSample

  test("sqrtTemperatureSample: quotas are totalN*isqrt(n) div sum(isqrt), drawn by hash rank") {
    // strata sizes: a=100, b=25, c=4 → isqrt 10, 5, 2 → den 17
    val rows = (1L to 100L).map(i => ("a", i)) ++
      (101L to 125L).map(i => ("b", i)) ++ (126L to 129L).map(i => ("c", i))
    val df = rows.toDF("lang", "id")
    val out = QuotaOps.sqrtTemperatureSample(df, "lang", 51L,
        SketchOps.portableHash(col("id")), Seq(col("id")))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 30L, "b" -> 15L, "c" -> 4L))
    // 51*10/17 = 30, 51*5/17 = 15, 51*2/17 = 6 but stratum c has only 4
  }

  test("sqrtTemperatureSample: deterministic across invocations") {
    val df = (1L to 60L).map(i => (if (i % 3 == 0) "x" else "y", i))
      .toDF("lang", "id")
    def draw() = QuotaOps.sqrtTemperatureSample(df, "lang", 20L,
        SketchOps.portableHash(col("id")), Seq(col("id")))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(draw() == draw())
  }
}
