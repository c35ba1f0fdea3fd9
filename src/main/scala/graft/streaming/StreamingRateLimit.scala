package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user token-bucket admission control as a STREAMING operator —
  * the ingest-side rate limiter (a runaway client or scraper is capped
  * at the door, before its burst reaches the state stores downstream).
  * Complements StreamingDebounce: debounce drops near-duplicates of
  * the PREVIOUS event; the token bucket enforces a sustained RATE with
  * a burst allowance, the standard traffic-shaping semantics.
  *
  * Semantics (all integer, in µtokens: 1 token = 10⁶ µtok): the bucket
  * starts full at `CapUtok`; between consecutive events it refills by
  * `Δµs div RefillDiv` µtok (RefillDiv = 3600 ⇒ 1 token/hour), clamped
  * at the cap; an event is ADMITTED iff ≥ `CostUtok` is available, and
  * admission spends exactly `CostUtok`. Rejected events still advance
  * the clock (refill is wall-time-based, not event-based). Integer
  * division is the DEFINED semantics — both the batch oracle's
  * recursive replay and this fold truncate identically, so there is no
  * float seam anywhere in the recurrence.
  *
  * State per user is two longs (µtokens, last event time) — the
  * StreamingDebounce state-minimalism contract. Events fold in
  * (tu, event_id) order within each micro-batch; in-order streams are
  * exact, late rows fold where they land, and the batch form
  * (`w17_rate_limit`, which calls the SAME [[advance]]) is the
  * authoritative replay — parity across a mid-history split is pinned
  * in FileStreamSpec's sibling RateLimitSpec.
  */
object StreamingRateLimit {

  final case class Ev(user_id: Long, tu: Long, event_id: Long)

  val CapUtok = 2000000L   // burst allowance: 2 tokens
  val CostUtok = 1000000L  // 1 token per admitted event
  val RefillDiv = 3600L    // 1 token/hour at µs resolution

  /** Pure fold shared by the streaming operator and the batch query:
    * returns ((µtokens, last tu), per-event admission flags in fold
    * order). `st = None` means a fresh bucket (full, no clock). */
  def advance(st: Option[(Long, Long)], batch: Seq[Ev])
      : ((Long, Long), List[(Ev, Boolean)]) = {
    var tok = st.map(_._1).getOrElse(CapUtok)
    var last = st.map(_._2)
    val out = List.newBuilder[(Ev, Boolean)]
    batch.sortBy(e => (e.tu, e.event_id)).foreach { e =>
      last.foreach(p => tok = math.min(CapUtok, tok + (e.tu - p) / RefillDiv))
      val admit = tok >= CostUtok
      if (admit) tok -= CostUtok
      out += ((e, admit))
      last = Some(e.tu)
    }
    ((tok, last.getOrElse(0L)), out.result())
  }

  /** Append-mode stream: admitted events pass through, rejected ones
    * vanish (the debounce output contract). */
  def rateLimit(events: Dataset[Ev]): Dataset[Ev] = {
    implicit val stEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[Ev] = Encoders.product[Ev]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long), Ev](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[(Long, Long)]) =>
          val (st, res) = advance(state.getOption, it.toSeq)
          state.update(st)
          res.collect { case (e, true) => e }.iterator
      }
  }
}
