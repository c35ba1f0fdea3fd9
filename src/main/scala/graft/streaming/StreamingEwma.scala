package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.EwmaOps

/** W19's integer EWMA smoother as a STREAMING operator (SURVEY §2.10
  * companion to queries/SignalQueries.w19): the recurrence
  * s = (3s + v) div 4 IS per-key state — three longs per user — so the
  * live form is the natural one; the batch query replays it as a typed
  * fold over the full history. Both run [[EwmaOps.step]], so parity is
  * by construction, pinned end-to-end in SignalSpec.
  *
  * Events fold in (tu, event_id) order WITHIN each micro-batch
  * (the StreamingCusum order rule: the recurrence is order-sensitive,
  * late rows fold in arrival order, and the batch form is the
  * exact-order replay when order must be authoritative). Update-mode
  * output re-emits a user's summary whenever state changes.
  */
object StreamingEwma {

  final case class Ev(user_id: Long, tu: Long, event_id: Long, v: Long)
  final case class Out(user_id: Long, n_events: Long, ewma_cents: Long,
    n_spikes: Long)

  /** Pure batch-fold step — deterministic given batch contents. */
  def advance(st: EwmaOps.St, batch: Seq[Ev]): EwmaOps.St =
    batch.sortBy(e => (e.tu, e.event_id))
      .foldLeft(st)((acc, e) => EwmaOps.step(acc, e.v))

  /** Streaming wrapper: Update-mode per-user summaries. */
  def ewma(events: Dataset[Ev]): Dataset[Out] = {
    implicit val stEnc = Encoders.product[EwmaOps.St]
    implicit val outEnc = Encoders.product[Out]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[EwmaOps.St, Out](GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[EwmaOps.St]) =>
          val st = advance(state.getOption.getOrElse(EwmaOps.emptySt), it.toSeq)
          state.update(st)
          Out(user, st.n, st.s, st.spikes)
      }
  }
}
