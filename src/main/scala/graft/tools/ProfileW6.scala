package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Dev probe (r13, VERDICT item 3): w6_session_window was never
  * profiled — JobCensus shows it is NOT floor-bound (5 jobs, but three
  * real ~100k-record stages totalling 2.4 s task-time), so the open
  * question is whether Spark's native `session_window` sort-merge path
  * loses to the classic gaps-and-islands form: lag-diff flags session
  * starts, a running sum numbers them, one hash aggregate per
  * (user, island) — lag + cumsum + agg all cluster on user_id, so the
  * whole query is ONE exchange. Parity checksummed (identical output
  * contract: session_end = max(ts) + gap). Alternating GC-separated
  * reps in one JVM.
  */
object ProfileW6 {
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
      println(f"[w6] $tag%-12s $dt%6.3f s  jobs=${jobCount.get() - j0}")
    }
    def sig(df: DataFrame): Long =
      df.select((xxhash64(df.columns.map(col): _*) % 1000000007L).as("h"))
        .agg(sum("h")).head.getLong(0)

    def native(): DataFrame =
      Tables.events(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(25,10)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          unix_micros(col("session_window.end")).as("session_end"),
          col("n_events"), col("sum_value"))

    def islands(): DataFrame = {
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"),
          col("value").cast("decimal(25,10)").as("v"))
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800000000L,
            1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("v")).cast("double").as("sum_value"),
          min(col("ts")).as("mn"), max(col("ts")).as("mx"))
        .select(col("user_id"),
          unix_micros(col("mn")).as("session_start"),
          unix_micros(col("mx") + expr("INTERVAL 30 MINUTES")).as("session_end"),
          col("n_events"), col("sum_value"))
    }

    val sN = sig(native())
    val sI = sig(islands())
    println(s"[w6] parity ${if (sN == sI) "OK" else s"MISMATCH $sN vs $sI"}")
    require(sN == sI, "parity")
    for (r <- 1 to reps) {
      time(s"native#$r")(native())
      time(s"islands#$r")(islands())
    }
    spark.stop()
  }
}
