package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W3's stateful sentence regroup as a STREAMING operator (SURVEY §2.5 /
  * §2.10; batch form in operators/RegroupOps.scala, reference
  * pre_processing/process_all.py:305-335): sentences arrive unbounded and
  * possibly out of order within a book; groups are emitted as soon as the
  * word-count threshold is crossed on a CONTIGUOUS sentence prefix.
  *
  * `flatMapGroupsWithState` is the idiomatic Spark shape: state is
  * per-book (the buffered out-of-order suffix plus the open group), not
  * per-stream, so it scales with in-flight disorder, not corpus size. A
  * processing-time timeout flushes the final partial group with the
  * reference's `>= threshold/2` tail rule — the streaming equivalent of
  * end-of-file.
  */
object StreamingRegroup {

  final case class Sentence(doc_id: String, rn: Long, sentence: String, wc: Long)
  final case class GroupOut(doc_id: String, grp_idx: Int, grp_text: String, grp_wc: Long)

  /** Per-book state: next expected sentence rn, open-group accumulator,
    * and the out-of-order buffer (sentences with rn > nextRn). */
  final case class Buf(
    nextRn: Long, grpIdx: Int, accTextRev: List[String], accWc: Long,
    pending: List[Sentence])

  val emptyBuf: Buf = Buf(1L, 0, Nil, 0L, Nil)

  /** Pure fold step: absorb a batch of (possibly out-of-order) sentences,
    * consume the contiguous prefix, emit every group that crosses
    * `threshold`. Deterministic regardless of batch boundaries. */
  def advance(doc: String, buf: Buf, batch: Seq[Sentence], threshold: Int): (Buf, List[GroupOut]) = {
    var pending = (buf.pending ++ batch).sortBy(_.rn)
    var nextRn = buf.nextRn
    var grpIdx = buf.grpIdx
    var accRev = buf.accTextRev
    var accWc = buf.accWc
    val out = List.newBuilder[GroupOut]
    while (pending.nonEmpty && pending.head.rn == nextRn) {
      val s = pending.head
      pending = pending.tail
      nextRn += 1
      accRev = s.sentence :: accRev
      accWc += s.wc
      if (accWc >= threshold) {
        out += GroupOut(doc, grpIdx, accRev.reverse.mkString(" "), accWc)
        grpIdx += 1; accRev = Nil; accWc = 0L
      }
    }
    (Buf(nextRn, grpIdx, accRev, accWc, pending), out.result())
  }

  /** Pure end-of-stream step: the reference's `//2` tail rule over the
    * open group (buffered non-contiguous sentences are dropped — they can
    * never become contiguous once the stream is declared over). */
  def finishTail(doc: String, buf: Buf, threshold: Int): Option[GroupOut] =
    if (buf.accTextRev.nonEmpty && buf.accWc >= threshold / 2)
      Some(GroupOut(doc, buf.grpIdx, buf.accTextRev.reverse.mkString(" "), buf.accWc))
    else None

  /** Streaming wrapper. Append-mode output; `tailTimeout` (e.g.
    * Some("30 seconds")) is how long a book may stay idle before its open
    * group is flushed with the tail rule. Pass None to disable the flush —
    * with a processing-time timeout registered, the micro-batch engine
    * re-triggers on every trigger interval to check timers, so pair a
    * timeout with a real `Trigger.ProcessingTime` (the default 0 ms
    * trigger busy-loops empty batches). */
  def regroup(
      sentences: Dataset[Sentence], threshold: Int,
      tailTimeout: Option[String] = Some("30 seconds")): Dataset[GroupOut] = {
    implicit val bufEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[GroupOut]
    val timeoutConf = if (tailTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    sentences.groupByKey(_.doc_id)(Encoders.STRING)
      .flatMapGroupsWithState[Buf, GroupOut](OutputMode.Append(), timeoutConf) {
        (doc: String, it: Iterator[Sentence], state: GroupState[Buf]) =>
          if (state.hasTimedOut) {
            val tail = finishTail(doc, state.get, threshold)
            state.remove()
            tail.iterator
          } else {
            val (buf, emitted) =
              advance(doc, state.getOption.getOrElse(emptyBuf), it.toSeq, threshold)
            state.update(buf)
            tailTimeout.foreach(state.setTimeoutDuration)
            emitted.iterator
          }
      }
  }
}
