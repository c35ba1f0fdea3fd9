package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profiler: a19_frequent_pairs stage breakdown at sf0.1. */
object ProfileA19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def opRaw = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    time("warmup op noop")(noop(opRaw))
    for (r <- 1 to 2) {
      var op: DataFrame = null
      time(s"[$r] op distinct checkpoint") { op = opRaw.localCheckpoint(true) }
      time(s"[$r] pair agg top20") {
        noop(op.select(col("o"), col("p").as("p1"))
          .join(op.select(col("o"), col("p").as("p2")), Seq("o"))
          .filter(col("p1") < col("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
          .orderBy(col("support").desc, col("p1"), col("p2")).limit(20))
      }
      time(s"[$r] pc agg")(noop(op.groupBy("p").agg(count(lit(1)).as("c"))))
      time(s"[$r] tx countDistinct")(noop(op.agg(countDistinct(col("o")).as("tt"))))
      op.unpersist()
    }
    time("a19 full")(noop(
      graft.queries.MetricsQueries.queries("a19_frequent_pairs")(spark, sfDir)))
    time("a19 warm")(noop(
      graft.queries.MetricsQueries.queries("a19_frequent_pairs")(spark, sfDir)))
    spark.stop()
  }
}
