package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.TestSpark

/** Contracts for the sortable_bits double->long ranking key and the
  * TopKOps.topKByScore tail that replaced the ANN family's window sorts:
  * the encoding must order EXACTLY like the engines' ORDER BY ... DESC
  * (incl. -0.0/0.0 ties and NaN-largest), or a bounded-aggregator rank
  * could silently diverge from the window rank the oracle replays.
  */
class TopKScoreSpec extends AnyFunSuite with TableDrivenPropertyChecks {
  private lazy val spark = TestSpark.spark

  private def enc(d: Double): Long =
    graft.functions.NativeExprs.sortableBitsJvm(d)

  test("sortable_bits is strictly monotone over an edge-case gauntlet") {
    val line = Seq(
      Double.NegativeInfinity, -1.7e308, -2.5, -1.0, -1e-300,
      0.0, 1e-300, 0.5, 1.0, 2.5, 1.7e308, Double.PositiveInfinity)
    val encs = line.map(enc)
    line.zip(encs).sliding(2).foreach { case Seq((a, ea), (b, eb)) =>
      assert(ea < eb, s"enc($a)=$ea !< enc($b)=$eb")
    }
  }

  test("sortable_bits keys -0.0 and 0.0 equal (engines sort them as ties) " +
      "and NaN above +Infinity (engines sort NaN largest)") {
    assert(enc(-0.0) == enc(0.0))
    assert(enc(Double.NaN) > enc(Double.PositiveInfinity))
  }

  test("topKByScore reproduces the window formulation's exact output " +
      "on adversarial scores (ties, negatives, zeros)") {
    import spark.implicits._
    // group 1: a tie on 0.5 broken by id; group 2: negative scores and a
    // -0.0/0.0 tie — the window's (score DESC, id ASC) order is ground
    // truth, computed here via sortBy on the driver.
    val rows = Seq(
      (1, 10L, 0.5), (1, 11L, 0.5), (1, 12L, 0.75), (1, 13L, -0.25),
      (2, 20L, -0.0), (2, 21L, 0.0), (2, 22L, -3.5), (2, 23L, 2.0))
    val df = rows.toDF("g", "id", "s")
    val got = TopKOps.topKByScore(df, Seq("g"), col("s"), col("id"), 3,
        tieName = "id")
      .orderBy("g", "rank")
      .select("g", "rank", "id").as[(Int, Int, Long)].collect().toSeq
    // Normalize -0.0 to 0.0 first: Scala's tuple sort is IEEE TOTAL
    // order (-0.0 < 0.0) but both engines sort them as equal — the
    // engine tie-break by id is the contract under test.
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, s) => (if (s == 0.0) -0.0 else -s, id) }
        .take(3).zipWithIndex
        .map { case ((_, id, _), i) => (g, i + 1, id) }
    }.sorted
    assert(got == want, s"got $got want $want")
  }

  test("the ANN ranked tails carry no window sort in their plans") {
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    graft.functions.TextFns.registerAll(spark)
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 10)
    for ((name, df) <- Seq(
        "brute" -> SimilarityOps.bruteTopK(q, e, "vec_id", "embedding", 5),
        "bucketed" -> SimilarityOps.bucketedTopK(q, e, "vec_id", "embedding", 5),
        "pq" -> PqOps.pqTopK(q, e, "vec_id", "embedding", 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("windowspecdefinition"),
        s"$name regressed to the window formulation")
    }
  }
}
