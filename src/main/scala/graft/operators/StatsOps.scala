package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for corpus QC (doc-length / duration / score
  * percentiles per group — the inputs to quality-gate thresholds like
  * the reference's segment-duration band and WER cut).
  *
  * Exact percentiles normally force a per-group sort of every row. This
  * implementation reduces first: groupBy (group, value) with map-side
  * combine collapses the data to its VALUE HISTOGRAM (distinct values
  * per group — for integer-ish metrics like word counts, orders of
  * magnitude smaller than the rows), then one window over the tiny
  * histogram computes cumulative frequencies, and the q-th percentile
  * is the smallest value whose cumulative frequency reaches
  * ceil(q * n) — the classic discrete (type-1) quantile, replayable
  * as plain SQL in any engine. No full-table sort ever happens; the
  * only per-row work is the initial combine.
  */
object StatsOps {

  /** One row per group: `p<q>` columns hold the exact discrete
    * q-percentile of `valueCol` (e.g. qs = Seq(0.5, 0.9, 0.99) →
    * p50, p90, p99). */
  def exactPercentiles(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    // Null policy: null values are excluded from the distribution AND from
    // __n. Without the filter the two engines disagree silently — Spark's
    // window orderBy sorts NULLS FIRST (inflating every cumulative count)
    // while DuckDB sorts NULLS LAST — so the contract is explicit:
    // percentiles are over non-null measurements only.
    val freq = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__f"))
    // Totals come from the histogram, NOT a second scan of df — the
    // input's rows are touched exactly once (the combine above); this
    // aggregation runs over histogram-sized data.
    val totals = freq.groupBy(col(groupCol)).agg(sum(col("__f")).as("__n"))
    val cum = freq
      .withColumn("__cf", sum(col("__f")).over(
        Window.partitionBy(groupCol).orderBy(valueCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(totals), Seq(groupCol))
    val picks = qs.map { q =>
      // setScale before strip: q*100 in double arithmetic yields values
      // like 99.00000000000001, which would leak into the column name.
      val label = "p" + BigDecimal(q * 100).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
      min(when(col("__cf") >= ceil(col("__n") * q), col(valueCol))).as(label)
    }
    cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }
}
