package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry, Tables}
import graft.operators.RankOps

/** Dev probe (r13): a24_winsorized_mean joined the ≥2× list as pure
  * floor inflation (1.08 s / 184×), but its plan builds TWO broadcasts
  * whose build plans each contain the whole global-rank subtree.
  * VERDICT (recorded in SignalQueries a24): the one-pass threshold
  * fold measured neutral-to-worse — the duplicated rank lineage
  * already collapses via physical exchange reuse, and the fold's extra
  * aggregate cancels the saved broadcast; the registered two-broadcast
  * form stays (and is the baseline here, taken from the registry so
  * the probe cannot drift from the shipped plan). Parity checksummed.
  */
object ProfileA24 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    val h = new ProbeHarness(spark, "a24")

    def cur(): DataFrame =
      SparkEntry.queries("a24_winsorized_mean")(spark, sfDir)

    // Rejected shape: both order statistics from ONE filtered pass,
    // folded to a single (lo, hi) row, one broadcast.
    def fused(): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val nn = docs.agg(count(lit(1)).as("nn"))
      val ranked = RankOps.globalRowNumber(
          docs, Seq(col("n_chars").asc, col("doc_id").asc), "rn")
        .crossJoin(broadcast(nn))
      val thr = ranked
        .filter(expr("rn = (nn + 9) div 10 OR rn = (9 * nn + 9) div 10"))
        .groupBy()
        .agg(min(when(expr("rn = (nn + 9) div 10"), col("n_chars"))).as("lo"),
          min(when(expr("rn = (9 * nn + 9) div 10"), col("n_chars"))).as("hi"))
      docs.crossJoin(broadcast(thr))
        .select(col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("n_chars"))).as("w"))
        .groupBy()
        .agg(count(lit(1)).as("n_docs"), min(col("lo")).as("p10"),
          min(col("hi")).as("p90"),
          sum(col("w").cast("decimal(38,0)")).as("sw"))
        .select(expr("CAST(n_docs AS BIGINT)").as("n_docs"),
          col("p10"), col("p90"),
          expr("CAST((sw * 1000000) div n_docs AS BIGINT)").as("wmean_ppm"))
    }

    h.parity(h.sig(cur()), Seq("fused" -> (() => fused())))
    for (r <- 1 to reps) { h.time(s"cur#$r")(cur()); h.time(s"fused#$r")(fused()) }
    spark.stop()
  }
}
