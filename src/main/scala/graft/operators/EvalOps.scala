package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed evaluation metrics for quality classifiers (beyond-
  * reference, SURVEY §2.11). A curation pipeline that trains or tunes a
  * quality model (DSIR votes, Moore–Lewis cross-entropy, fastText-style
  * gates) needs to MEASURE it before trusting it to delete data — and
  * the standard measurement, ROC-AUC, is textbook-defined through a
  * global sort (rank-sum / Mann–Whitney U), which is exactly the shape
  * that does not distribute.
  *
  * The scalable formulation used here: quantize the score to integer
  * buckets, histogram (bucket → positives, negatives) with one keyed
  * aggregation, then run the rank arithmetic over the HISTOGRAM — whose
  * row count is bounded by the number of distinct buckets, not the
  * number of rows. Within-bucket ties contribute half a pair each,
  * exactly the average-rank tie convention of the textbook statistic;
  * the only approximation is the quantization itself (scores that
  * differ within one bucket count as tied), which the caller controls
  * through the bucket expression. AUC over the quantized scores is
  * EXACT, integer end-to-end:
  *
  *   U2 = Σ_b P_b · (2·N_below(b) + N_b)        (pairs counted twice)
  *   auc_ppm = U2 · 10⁶ div (2 · P · N)
  *
  * Scale shape: one shuffle to the bucket histogram (map-side combine),
  * then a single-partition running sum over the bucket table — bounded
  * driver-free state, same justification as StatsOps' histogram
  * percentiles (at 100 TB the histogram is still ≤ #distinct buckets;
  * pick a coarser quantization, not a bigger machine).
  */
object EvalOps {

  /** ROC-AUC of `scoreBucket` (integral, higher = more positive-ish)
    * against boolean `isPositive`, in parts-per-million. Returns a
    * single row: (n_pos, n_neg, auc_ppm). Rows where either input is
    * null are excluded. Degenerate inputs (no positives or no
    * negatives) return auc_ppm = null rather than a division blow-up. */
  def aucPpm(df: DataFrame, scoreBucket: Column, isPositive: Column): DataFrame = {
    val hist = df
      .filter(scoreBucket.isNotNull && isPositive.isNotNull)
      .groupBy(scoreBucket.as("bucket"))
      .agg(
        sum(when(isPositive, 1L).otherwise(0L)).as("p"),
        sum(when(isPositive, 0L).otherwise(1L)).as("n"))
    // Histogram-sized window: ORDER BY with no PARTITION BY is a single
    // partition by construction — acceptable ONLY because the input is
    // the bucket table, not the row table.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    hist
      .withColumn("n_below", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(
        sum(col("p")).as("n_pos"),
        sum(col("n")).as("n_neg"),
        // Pair counts grow quadratically: u2 can reach 2·P·N ≈ (rows)²/2,
        // past BIGINT at ~4e9 rows. Lift to DECIMAL(38,0) BEFORE the
        // product (exact to 10^38 ≈ (1e19 rows)²; DuckDB's side sums
        // into HUGEINT, the same 128-bit class).
        sum(col("p").cast("decimal(38,0)") *
          (lit(2L) * col("n_below") + col("n"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
          .cast("long").as("auc_ppm"))
  }
}
