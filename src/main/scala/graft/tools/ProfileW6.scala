package graft.tools

import org.apache.spark.sql.{DataFrame, GraftBenchShim}
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry, Tables}

/** Dev probe (r13, VERDICT item 3): w6_session_window was never
  * profiled — JobCensus showed it is NOT floor-bound (three real
  * ~100k-record stages), so the question was whether Spark's native
  * `session_window` sort-merge path loses to the classic
  * gaps-and-islands form. VERDICT (recorded in RelationalQueries w6):
  * islands won every alternating rep (~15-25%; native median 1.02 vs
  * 0.86 s at sf0.1) and is now the REGISTERED batch form — so the
  * production side here comes from the registry (root sort stripped,
  * as Bench does) and only the rejected native shape is re-implemented
  * inline. Parity checksummed.
  */
object ProfileW6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    val h = new ProbeHarness(spark, "w6")

    def islands(): DataFrame = GraftBenchShim.stripRootSort(
      SparkEntry.queries("w6_session_window")(spark, sfDir))

    def native(): DataFrame =
      Tables.events(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(25,10)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          unix_micros(col("session_window.end")).as("session_end"),
          col("n_events"), col("sum_value"))

    h.parity(h.sig(islands()), Seq("native" -> (() => native())))
    for (r <- 1 to reps) {
      h.time(s"native#$r")(native())
      h.time(s"islands#$r")(islands())
    }
    spark.stop()
  }
}
