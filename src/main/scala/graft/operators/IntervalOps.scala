package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key merging of overlapping intervals — the gaps-and-islands
  * operator. This is the span-level form of what the duplicated-span
  * scrub family does by char-marking (TextFns.scrubSpans): char marking
  * is O(doc length) memory per row, exactly right while spans live
  * inside one document string, while THIS operator is the scalable shape
  * when intervals are rows (time ranges, byte ranges, dup-span windows
  * on very long documents): state per row is two longs, the heavy
  * lifting is one per-key sort.
  *
  * Plan shape: both window passes (prior-interval running max, then the
  * island counter) share one `(key ORDER BY start, end)` sort, so the
  * whole operator is ONE exchange + ONE sort + a map-side-combined
  * aggregation over island ids. Keys partition the work; no global sort,
  * no driver state. Skewed keys (one key owning millions of intervals)
  * sort within their task — the same per-key-order bound as every
  * sessionize/as-of shape in this codebase.
  *
  * Merge rule: intervals are half-open [start, end); a row merges into
  * the current island when `start <= max(end of all prior rows)` —
  * overlap OR touch. Rows with start > end are treated as empty but
  * still counted into whatever island contains their start (callers
  * wanting them dropped filter first). All arithmetic is integer
  * comparison, so the result replays exactly in any engine.
  */
object IntervalOps {

  /** Merge `[startCol, endCol)` intervals per `keyCol`. Output: one row
    * per merged span — (key, span_start, span_end, n_merged), where
    * n_merged counts the input intervals folded into the span. */
  def mergeIntervals(
      df: DataFrame, keyCol: String, startCol: String, endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    // Running max of END over the PRIOR rows only: null on each key's
    // first row (always an island start). Comparing against prior rows'
    // max (not lag(end)) is what makes nested intervals correct —
    // [0,100), [10,20), [30,40) is ONE island even though [30,40) does
    // not touch its immediate predecessor.
    val priorMax: Column = max(col(endCol))
      .over(byStart.rowsBetween(Window.unboundedPreceding, -1))
    val isNewIsland = when(priorMax.isNull || col(startCol) > priorMax, 1L)
      .otherwise(0L)
    df.withColumn("__island",
        sum(isNewIsland).over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
