package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** StreamingRateLimit against the pure fold: the admitted set must be
  * identical whether the burst arrives in one micro-batch or split
  * across two (the state carries µtokens + clock), and the token
  * arithmetic must match a hand trace of the bucket. */
class StreamingRateLimitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def us(sec: Long) = sec * 1000000L

  test("hand trace: burst of five admits exactly the 2-token allowance; " +
      "an hour's refill re-admits") {
    // t = 0..4s: bucket 2e6 -> admit(1e6) -> admit via +277 refill
    // -> three rejects; t = +2h: full refill clamps at cap -> admit.
    val evs = (0L until 5L).map(i => StreamingRateLimit.Ev(1L, us(i), i + 1)) :+
      StreamingRateLimit.Ev(1L, us(7200), 6L)
    val (st, res) = StreamingRateLimit.advance(None, evs)
    assert(res.map { case (e, a) => e.event_id -> a } ==
      List(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> false,
        6L -> true))
    // final state, exact trace: after the burst tok = 1108 µtok
    // (2 admissions spent, 4×277 refills), the 7196 s gap refills
    // 7196e6/3600 = 1998888 → 1999996 (just UNDER the cap — the clamp
    // never fires), admission spends 1e6 → 999996.
    assert(st._2 == us(7200), "clock must be the last event's tu")
    assert(st._1 == 999996L, s"got ${st._1}")
  }

  test("streaming admits the batch-identical set across a mid-burst split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val evs = Seq(
      StreamingRateLimit.Ev(1L, us(0), 1L), StreamingRateLimit.Ev(1L, us(1), 2L),
      StreamingRateLimit.Ev(1L, us(2), 3L), StreamingRateLimit.Ev(1L, us(3), 4L),
      StreamingRateLimit.Ev(1L, us(7200), 5L),
      StreamingRateLimit.Ev(2L, us(0), 10L),
      StreamingRateLimit.Ev(2L, us(3600), 11L),
      StreamingRateLimit.Ev(2L, us(3610), 12L),
      StreamingRateLimit.Ev(2L, us(3620), 13L))
    val mem = MemoryStream[StreamingRateLimit.Ev]
    val q = StreamingRateLimit.rateLimit(mem.toDS())
      .writeStream.format("memory").queryName("rl_out")
      .outputMode("append").start()
    try {
      // split INSIDE user 1's burst: µtokens and clock must carry over
      mem.addData(evs.take(2): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("rl_out").as[StreamingRateLimit.Ev]
        .collect().map(_.event_id).toSet
      val want = evs.groupBy(_.user_id).values.flatMap { es =>
        StreamingRateLimit.advance(None, es)._2.collect { case (e, true) => e }
      }.map(_.event_id).toSet
      assert(streamed == want)
      // user 1: 2-token burst then the 2h gap refills past cost.
      // user 2: head admits (spend to 1e6), the exact-hour refill
      // clamps at cap and admits 11 (back to 1e6), 12's +2777 refill
      // still clears cost (1002777) and admits, draining to 2777 —
      // only then is 13 rejected.
      assert(streamed == Set(1L, 2L, 5L, 10L, 11L, 12L))
    } finally q.stop()
  }
}
