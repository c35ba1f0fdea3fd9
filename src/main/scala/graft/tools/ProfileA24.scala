package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.operators.RankOps

/** Dev probe (r13): a24_winsorized_mean joined the ≥2× list as pure
  * floor inflation (1.08 s / 184×), but its plan builds TWO broadcasts
  * whose build plans each contain the whole global-rank subtree (the
  * p10 filter and the p90 filter) — the range exchange dedupes via
  * reuse, but the sort + offset join + filter chain executes once per
  * broadcast. One pass can produce BOTH order statistics: filter to
  * the two target ranks, fold the ≤2 rows to one (lo, hi) row with
  * conditional mins, broadcast once. Same-JVM alternating A/B, parity
  * checksummed.
  */
object ProfileA24 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)

    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    def cooldown(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
    }
    def time(tag: String)(f: => DataFrame): Unit = {
      cooldown()
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[a24] $tag%-10s $dt%6.3f s  jobs=${jobCount.get() - j0}")
    }
    def sig(df: DataFrame): Long =
      df.select((xxhash64(df.columns.map(col): _*) % 1000000007L).as("h"))
        .agg(sum("h")).head.getLong(0)

    def docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))

    def cur(): DataFrame = {
      val nn = docs.agg(count(lit(1)).as("nn"))
      val ranked = RankOps.globalRowNumber(
          docs, Seq(col("n_chars").asc, col("doc_id").asc), "rn")
        .crossJoin(broadcast(nn))
      val lo = ranked.filter(expr("rn = (nn + 9) div 10"))
        .select(col("n_chars").as("lo"))
      val hi = ranked.filter(expr("rn = (9 * nn + 9) div 10"))
        .select(col("n_chars").as("hi"))
      docs.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
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

    def fused(): DataFrame = {
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

    val sC = sig(cur())
    val sF = sig(fused())
    println(s"[a24] parity ${if (sC == sF) "OK" else s"MISMATCH $sC vs $sF"}")
    require(sC == sF, "parity")
    for (r <- 1 to reps) { time(s"cur#$r")(cur()); time(s"fused#$r")(fused()) }
    spark.stop()
  }
}
