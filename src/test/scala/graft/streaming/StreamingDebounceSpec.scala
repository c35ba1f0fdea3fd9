package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** StreamingDebounce against the pure fold and the batch w14 counts —
  * the kept set must be identical whether the burst arrives in one
  * micro-batch or split across two. */
class StreamingDebounceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val hourUs = 3600000000L

  test("streaming debounce keeps the batch-identical set across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // user 1: burst at t0,+1m,+2m,+3m then +2h; user 2: exactly 1h spacing
    def us(min: Long) = min * 60000000L
    val evs = Seq(
      StreamingDebounce.Ev(1L, us(0), 1L), StreamingDebounce.Ev(1L, us(1), 2L),
      StreamingDebounce.Ev(1L, us(2), 3L), StreamingDebounce.Ev(1L, us(3), 4L),
      StreamingDebounce.Ev(1L, us(130), 5L),
      StreamingDebounce.Ev(2L, us(0), 10L), StreamingDebounce.Ev(2L, us(60), 11L),
      StreamingDebounce.Ev(2L, us(120), 12L))
    val mem = MemoryStream[StreamingDebounce.Ev]
    val q = StreamingDebounce.debounce(mem.toDS(), hourUs)
      .writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      // split INSIDE user 1's burst: state must carry the last-seen tu
      mem.addData(evs.take(3): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("deb_out").as[StreamingDebounce.Ev]
        .collect().map(_.event_id).toSet
      // pure-fold reference over the unsplit history
      val want = evs.groupBy(_.user_id).values.flatMap { es =>
        StreamingDebounce.advance(None, es, hourUs)._2
      }.map(_.event_id).toSet
      assert(streamed == want)
      assert(streamed == Set(1L, 5L, 10L, 11L, 12L),
        "burst collapses to its head; hour-spaced events all keep (>=)")
    } finally q.stop()
  }
}
