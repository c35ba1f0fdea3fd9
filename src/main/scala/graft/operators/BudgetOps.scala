package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sampling: keep the maximal prefix of the corpus, in a
  * deterministic priority order, whose cumulative token count fits a
  * global budget — the "fill a 1B-token training mix" cut of a curation
  * pipeline. A document is wholly in or wholly out; the first document
  * that would overflow the budget, and everything ranked after it, is
  * dropped (cumulative-sum-≤-budget prefix, so the cut is replayable as
  * one window in engine-independent SQL).
  *
  * Beyond-reference operator (SURVEY §2.11); composes with the other
  * draws on the same hash order — e.g. temperature-rebalance the mix
  * (QuotaOps.sqrtTemperatureSample), then budget-cut the result.
  */
object BudgetOps {

  /** Keep rows in ascending (`priorityCol`, `tieCols`) order while the
    * running sum of `tokCol` stays ≤ `budget`.
    *
    * `priorityCol` must be a non-null integer in [0, `priMax`) —
    * [[SketchOps.portableHash]] for a uniform draw (a budget-bounded
    * random subsample), or any integer quality rank to fill the budget
    * best-first. A null priority or a null/negative token count is a
    * caller bug; rows with null priority are dropped rather than given
    * a wrong rank, null token counts cost 0.
    *
    * Scale shape: a global running sum is NOT a global window (one
    * partition = one task = the whole corpus through one executor).
    * Instead: (1) one aggregate of per-bucket token sums, where bucket =
    * priority div ceil(priMax/nBuckets) is row-local — only `nBuckets`
    * rows cross the wire; (2) the driver prefix-sums that bounded array
    * and finds the boundary bucket — every bucket below it fits the
    * budget whole, every bucket above it is entirely out; (3) rows below
    * the boundary pass through a row-local filter — NO shuffle, no
    * window; (4) only the boundary bucket (~1/nBuckets of the corpus) is
    * window-summed against the leftover budget. Two scans of the fact
    * table (sum + emit) is the floor for an exact global budget; the
    * emit side's bucket predicates are plain comparisons on a derived
    * column, so Catalyst prunes columns and pushes what it can to the
    * scan. The RESULT is invariant in nBuckets (any partition of a
    * monotone prefix is the same prefix — pinned by BudgetOpsSpec), so
    * nBuckets is purely a parallelism knob: size it so corpus/nBuckets
    * fits one task comfortably (1024 → ~100 GB boundary bucket at
    * 100 TB).
    */
  def tokenBudgetSample(
      df: DataFrame, priorityCol: Column, tieCols: Seq[Column],
      tokCol: Column, budget: Long, priMax: Long = SketchOps.hashM,
      nBuckets: Int = 1024): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    require(priMax >= 1, "priMax must be >= 1")
    require(!df.columns.exists(_.startsWith("__tb_")),
      "input may not carry __tb_* columns")
    val width = (priMax + nBuckets - 1) / nBuckets
    val withB = df
      .withColumn("__tb_pri", priorityCol.cast("long"))
      .withColumn("__tb_tok", coalesce(tokCol.cast("long"), lit(0L)))
      .withColumn("__tb_bkt", (col("__tb_pri") / width).cast("int"))
      .filter(col("__tb_pri").isNotNull)
    // Bounded: at most nBuckets rows come back, whatever the corpus size.
    val bucketSums = withB.groupBy("__tb_bkt").agg(sum("__tb_tok").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    var boundary = -1 // bucket that straddles the budget; -1 = all fit
    val it = bucketSums.iterator
    while (boundary < 0 && it.hasNext) {
      val (b, s) = it.next()
      if (acc + s <= budget) acc += s else boundary = b
    }
    val internal = Seq("__tb_pri", "__tb_tok", "__tb_bkt")
    if (boundary < 0) return withB.drop(internal: _*)
    val keepWhole = withB.filter(col("__tb_bkt") < boundary)
    val w = Window.partitionBy(col("__tb_bkt"))
      .orderBy(col("__tb_pri") +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeep = withB.filter(col("__tb_bkt") === boundary)
      .withColumn("__tb_cum", sum(col("__tb_tok")).over(w))
      .filter(col("__tb_cum") <= budget - acc)
      .drop("__tb_cum")
    keepWhole.unionByName(boundaryKeep).drop(internal: _*)
  }
}
