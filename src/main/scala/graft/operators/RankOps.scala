package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global row numbering (beyond-reference, SURVEY
  * §2.11). `ROW_NUMBER() OVER (ORDER BY …)` with no PARTITION BY is the
  * single most common accidental scale-killer in analytics SQL: Spark
  * executes it as ONE task holding the entire sorted input. But a global
  * rank over a total order is computable with no single-partition pass
  * over the data at all — range-partition on the sort key (Spark samples
  * boundaries; the partitioner guarantees partition i's keys all precede
  * partition i+1's), rank locally per partition, then add per-partition
  * row-count offsets. The offsets table has one row per PARTITION — the
  * only single-partition work is a running sum over that, and the final
  * rank is independent of where the sampled boundaries landed because
  * the order is total.
  *
  * The caller must supply a TOTAL order (include a unique tiebreak
  * column); under ties the boundary split between two range partitions
  * would otherwise make the assignment nondeterministic — the same
  * contract every deterministic-sort oracle in this repo already
  * carries.
  *
  * Scale shape: one range exchange of the rows (the sort Spark would do
  * anyway), one P-row aggregate, one broadcast-joined offset add. No
  * collect; offsets live in a P-row DataFrame joined by partition id.
  */
object RankOps {

  /** `df` with an extra BIGINT column `rankCol` = 1-based position in
    * the total order given by `order`.
    *
    * A naive `row_number().over(Window.partitionBy(pid))` here would add
    * a SECOND full exchange (hash on pid) after the range exchange; the
    * in-partition index instead comes from `monotonically_increasing_id`
    * AFTER `sortWithinPartitions` — increasing within a partition by
    * contract (no bit-layout assumption: the per-partition base is
    * subtracted via min(mid), not masked off), so rank falls out of
    * per-partition (count, min) stats alone. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      rankCol: String = "rn"): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    // P-row stats: per-partition row count and id base. The running sum
    // over partition order is the only single-partition step — over P
    // rows, never data rows.
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__base"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__cnt")
    local
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol,
        (col("__offset") + (col("__mid") - col("__base")) + 1).cast("long"))
      .drop("__pid", "__mid", "__base", "__offset")
  }

  /** Size-balanced shard assignment: order rows by `order` (typically
    * size DESC with a unique tiebreak) and deal them round-robin into
    * `nShards` shards — the classic longest-processing-time-ish layout
    * that keeps output file sizes near-equal without bin-packing state.
    * Adds `shard` (0-based INT). */
  def roundRobinShards(df: DataFrame, order: Seq[Column],
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    globalRowNumber(df, order)
      .withColumn("shard", ((col("rn") - 1) % nShards).cast("int"))
      .drop("rn")
  }
}
