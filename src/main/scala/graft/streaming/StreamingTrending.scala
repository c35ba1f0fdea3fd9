package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** W20's per-hour trending top-k as a STREAMING operator (SURVEY §2.10
  * companion to queries/SignalQueries.w20): the live "trending now"
  * board. State per hour bucket is the per-type count map — bounded by
  * the event-type vocabulary, not by events — and each micro-batch
  * re-emits the bucket's current top-k with the batch query's exact
  * deterministic order (count desc, type asc), so the FINAL emission
  * per bucket equals the batch result and parity is pinned end-to-end
  * in SignalSpec.
  *
  * The top-k cut happens at EMIT time from the full count map: a
  * stream cannot discard a type that is currently outside the top k,
  * because later events may promote it (the classic
  * streaming-top-k-needs-full-counters fact; a bounded-memory variant
  * would substitute a CMS + heap and change the contract to
  * approximate).
  */
object StreamingTrending {

  final case class Ev(hour_bucket: Long, event_type: String)
  final case class Out(hour_bucket: Long, rank: Int, event_type: String,
    n_events: Long)

  /** Pure fold step: merge a batch's type counts into the state map. */
  def advance(st: Map[String, Long], batch: Seq[Ev]): Map[String, Long] =
    batch.foldLeft(st)((m, e) =>
      m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L))

  /** The deterministic top-k cut shared with the parity test. */
  def topK(st: Map[String, Long], k: Int): Seq[(Int, String, Long)] =
    st.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((t, c), i) => (i + 1, t, c) }

  /** Streaming wrapper: Update-mode per-bucket top-k rows. */
  def trending(events: Dataset[Ev], k: Int): Dataset[Out] = {
    implicit val stEnc = Encoders.kryo[Map[String, Long]]
    implicit val outEnc = Encoders.product[Out]
    events.groupByKey(_.hour_bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState[Map[String, Long], Out](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (bucket: Long, it: Iterator[Ev], state: GroupState[Map[String, Long]]) =>
          val st = advance(state.getOption.getOrElse(Map.empty), it.toSeq)
          state.update(st)
          topK(st, k).iterator.map { case (r, t, c) => Out(bucket, r, t, c) }
      }
  }
}
