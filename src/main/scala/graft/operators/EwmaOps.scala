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

  /** Fold an ORDERED value iterator; returns (n, final s, n_spikes).
    * Empty input → (0, 0, 0) (callers drop empty groups upstream). */
  def fold(vs: Iterator[Long]): (Long, Long, Long) = {
    var n = 0L
    var s = 0L
    var spikes = 0L
    vs.foreach { v =>
      if (n == 0L) s = v
      else {
        if (v > 2L * s) spikes += 1L
        s = (3L * s + v) / 4L
      }
      n += 1L
    }
    (n, s, spikes)
  }
}
