package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W14's per-user debounce as a STREAMING operator — the burst filter
  * applied at ingest, where it belongs (dropping a retry storm before
  * it hits the state stores downstream). State per user is ONE long
  * (the last event's timestamp — kept or not, matching the batch lag
  * semantics), the smallest possible keyed state. Events fold in
  * (tu, event_id) order within each micro-batch (the StreamingCusum
  * ordering contract: in-order streams are exact; late rows fold where
  * they land, and the batch form is the authoritative replay).
  * Append-mode: kept events pass through, dropped ones vanish.
  */
object StreamingDebounce {

  final case class Ev(user_id: Long, tu: Long, event_id: Long)

  /** Pure fold: returns (new last-seen tu, kept events). The batch
    * w14 rule — keep iff first event or gap from the PREVIOUS event
    * (kept or dropped) >= gapUs. */
  def advance(last: Option[Long], batch: Seq[Ev], gapUs: Long)
      : (Option[Long], List[Ev]) = {
    var prev = last
    val out = List.newBuilder[Ev]
    batch.sortBy(e => (e.tu, e.event_id)).foreach { e =>
      if (prev.forall(p => e.tu - p >= gapUs)) out += e
      prev = Some(e.tu)
    }
    (prev, out.result())
  }

  def debounce(events: Dataset[Ev], gapUs: Long): Dataset[Ev] = {
    implicit val stEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[Ev]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Long, Ev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[Long]) =>
          val (prev, kept) = advance(state.getOption, it.toSeq, gapUs)
          prev.foreach(state.update)
          kept.iterator
      }
  }
}
