package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingRegroup.{Buf, GroupOut, Sentence, advance, emptyBuf, finishTail}

class StreamingRegroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def s(rn: Long, text: String, wc: Long) = Sentence("d", rn, text, wc)

  test("advance: emits on threshold over the contiguous prefix only") {
    val (buf, out) = advance("d", emptyBuf,
      Seq(s(1, "a", 8), s(3, "c", 12), s(2, "b", 8)), 20)
    // 1,2,3 all present -> consume in order: a+b=16 <20; +c=28 -> emit
    assert(out == List(GroupOut("d", 0, "a b c", 28L)))
    assert(buf.nextRn == 4L && buf.pending.isEmpty && buf.accWc == 0L)
  }

  test("advance: out-of-order suffix is buffered until the gap fills") {
    val (buf1, out1) = advance("d", emptyBuf, Seq(s(2, "b", 30), s(3, "c", 30)), 20)
    assert(out1.isEmpty && buf1.pending.map(_.rn) == List(2L, 3L))
    val (buf2, out2) = advance("d", buf1, Seq(s(1, "a", 30)), 20)
    // gap filled -> three single-sentence groups, batch-identical result
    assert(out2 == List(
      GroupOut("d", 0, "a", 30L), GroupOut("d", 1, "b", 30L), GroupOut("d", 2, "c", 30L)))
    assert(buf2.pending.isEmpty)
  }

  test("advance is batch-boundary invariant") {
    val all = Seq(s(1, "a", 7), s(2, "b", 7), s(3, "c", 7), s(4, "d", 9), s(5, "e", 11))
    val oneShot = advance("d", emptyBuf, all, 20)
    val twoShot = {
      val (b1, o1) = advance("d", emptyBuf, all.take(2), 20)
      val (b2, o2) = advance("d", b1, all.drop(2), 20)
      (b2, o1 ++ o2)
    }
    assert(oneShot._2 == twoShot._2 && oneShot._1 == twoShot._1)
  }

  test("finishTail applies the //2 rule") {
    val kept = Buf(5L, 2, List("tail"), 10L, Nil)
    assert(finishTail("d", kept, 20).contains(GroupOut("d", 2, "tail", 10L)))
    val dropped = Buf(5L, 2, List("tail"), 9L, Nil)
    assert(finishTail("d", dropped, 20).isEmpty)
    assert(finishTail("d", emptyBuf, 20).isEmpty)
  }

  test("streaming end-to-end: out-of-order across micro-batches, append-mode emission") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Sentence]
    // NoTimeout here: the tail-flush timer is covered by the pure
    // finishTail test; a processing-time timer with the default 0 ms
    // trigger would busy-loop empty micro-batches under processAllAvailable.
    val q = StreamingRegroup.regroup(mem.toDS(), threshold = 20, tailTimeout = None)
      .writeStream.format("memory").queryName("regroup_out")
      .outputMode("append").start()
    try {
      // batch 1: book A rns 2,3 arrive before 1 -> nothing can emit
      mem.addData(Sentence("A", 2, "two", 8), Sentence("A", 3, "three", 8))
      q.processAllAvailable()
      assert(spark.table("regroup_out").count() == 0)
      // batch 2: the gap fills; B emits immediately
      mem.addData(Sentence("A", 1, "one", 8), Sentence("B", 1, "big", 25))
      q.processAllAvailable()
      val rows = spark.table("regroup_out").as[GroupOut].collect().sortBy(r => (r.doc_id, r.grp_idx))
      assert(rows.toSeq == Seq(
        GroupOut("A", 0, "one two three", 24L), GroupOut("B", 0, "big", 25L)))
    } finally q.stop()
  }
}
