package graft.operators

/** Integer exponential moving average (α = 1/4) over an ordered event
  * series — the standard smoother for per-entity engagement/latency
  * metrics, in the all-integer form both engines replay exactly.
  *
  * Recurrence: s₁ = v₁, s_t = (3·s_{t−1} + v_t) div 4. The
  * one-sided-blend form keeps every intermediate NON-NEGATIVE for
  * non-negative inputs, so truncating division (Spark `div`, DuckDB
  * `//`, Scala `/` on Long — all truncate toward zero) equals floor and
  * no sign-convention seam exists. Like the rate-limit bucket (w17),
  * the clamped integer recurrence has no window closed form — the batch
  * form is a per-entity typed fold, the oracle a rank-stepped recursive
  * CTE over the identical arithmetic.
  *
  * Also counted along the way: spikes, events more than 2× the running
  * average (v_t > 2·s_{t−1}, t ≥ 2) — the burst signal the smoothed
  * baseline exists to expose.
  */
object EwmaOps {

  /** The fold state: event count, current smoothed value, spike count.
    * Shared by the batch typed fold and the streaming operator
    * ([[graft.streaming.StreamingEwma]]) so batch/stream parity holds by
    * construction (the w13/w17 convention). */
  final case class St(n: Long, s: Long, spikes: Long)

  val emptySt: St = St(0L, 0L, 0L)

  /** One recurrence step. */
  def step(st: St, v: Long): St =
    if (st.n == 0L) St(1L, v, 0L)
    else St(st.n + 1L, (3L * st.s + v) / 4L,
      st.spikes + (if (v > 2L * st.s) 1L else 0L))

  /** Fold an ORDERED value iterator; returns (n, final s, n_spikes).
    * Empty input → (0, 0, 0) (callers drop empty groups upstream). */
  def fold(vs: Iterator[Long]): (Long, Long, Long) = {
    val st = vs.foldLeft(emptySt)(step)
    (st.n, st.s, st.spikes)
  }
}
