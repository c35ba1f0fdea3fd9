package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota (stratified) sampling to a TARGET corpus mix — the "data
  * mixing" step of a training pipeline: given per-stratum target weights
  * (domain/language proportions a la Pile/Dolma mixture tables), draw a
  * deterministic sample whose composition matches the weights as closely
  * as the data allows (a stratum short of its quota contributes
  * everything it has — quotas never invent rows).
  *
  * Beyond-reference operator (SURVEY §2.11); generalizes O4's
  * per-group fractional sample from one global pct to per-stratum
  * quotas derived from a weight table.
  *
  * Scale shape: per-stratum counts are one aggregate (rows = number of
  * strata, broadcast back); selection is rank-by-hash ≤ quota inside
  * each stratum — one shuffle of the fact table on the stratum key. The
  * hash order makes the draw deterministic and REPLAYABLE: re-running on
  * the same corpus draws the same sample (SURVEY §7.4 determinism
  * contract), and an engine-independent oracle can replay it as plain
  * window SQL. For tiny quota fractions compose with SampleOps-style
  * hash-prefix prefiltering on the same hash order; at mixing-typical
  * rates (tens of percent) the prefilter would keep most rows anyway.
  */
object QuotaOps {

  /** Sample `df` to `ceil(totalN * weight_s)` rows per stratum (capped by
    * the stratum's size). Strata absent from `weights` get quota 0.
    * `hashCol` must be a deterministic per-row scrambling (see
    * SketchOps.portableHash); `tieCols` break hash ties to keep the rank
    * total. Weights need not sum to 1 — they are treated as fractions of
    * `totalN` directly, so over- or under-specified mixes do what the
    * numbers say. */
  def quotaSample(
      df: DataFrame, stratumCol: String, weights: Map[String, Double],
      totalN: Long, hashCol: Column, tieCols: Seq[Column]): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be finite and non-negative")
    require(!df.columns.contains("__q_rn"), "input may not carry __q_rn")
    // The quota map rides the plan as a literal CASE — strata counts are
    // bounded (a mixture table is human-curated), never data-sized.
    val quota = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(stratumCol) === s, lit(math.ceil(totalN * w).toLong)).otherwise(acc)
    }
    df.withColumn("__q_rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(hashCol +: tieCols: _*)))
      .filter(col("__q_rn") <= quota)
      .drop("__q_rn")
  }
}
