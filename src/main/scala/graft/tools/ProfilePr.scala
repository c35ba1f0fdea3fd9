package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profiler: stage breakdown of g1 (dimensionNodes PageRank) and
  * g10 (seeded PPR) at sf0.1 — where does the ~3 s go? Not part of the
  * query surface. */
object ProfilePr {
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
      .select(col("l_suppkey"), col("l_partkey"))
    def fwd: DataFrame = li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst")).distinct()
    def edges: DataFrame =
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))

    // warm the IO + codegen path once
    time("warmup fwd noop")(noop(fwd))
    for (round <- 1 to 2) {
      time(s"[$round] fwd distinct noop")(noop(fwd))
      var e: DataFrame = null
      time(s"[$round] edges localCheckpoint") {
        e = edges.localCheckpoint(true)
      }
      var nodes: DataFrame = null
      time(s"[$round] nodes distinct checkpoint") {
        nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node")))
          .distinct().localCheckpoint(true)
      }
      var deg: DataFrame = null
      time(s"[$round] degrees checkpoint") {
        deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
          .localCheckpoint(true)
      }
      // one broadcast round: ranks(bcast+deg) join edges, agg by dst
      val r0 = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
      def oneRound(r: DataFrame): DataFrame = {
        val rs = r.join(deg, r("node") === deg("src"))
          .select(col("node"), col("rank_micro"), col("out_deg"))
        e.join(broadcast(rs), e("src") === rs("node"))
          .select(col("dst"), expr("rank_micro div out_deg").as("c"))
          .groupBy("dst").agg(sum("c").as("mass"))
      }
      var m1: DataFrame = null
      time(s"[$round] round1 agg checkpoint") {
        m1 = oneRound(r0).localCheckpoint(true)
      }
      time(s"[$round] round2 agg noop") {
        noop(oneRound(m1.select(col("dst").as("node"), col("mass").as("rank_micro"))))
      }
      e.unpersist(); nodes.unpersist(); deg.unpersist(); m1.unpersist()
    }
    time("g1 full")(noop(graft.queries.MetricsQueries.queries("g1_pagerank")(spark, sfDir)))
    time("g1 full warm")(noop(graft.queries.MetricsQueries.queries("g1_pagerank")(spark, sfDir)))
    time("g10 full")(noop(graft.queries.MetricsQueries.queries("g10_ppr")(spark, sfDir)))
    time("g10 full warm")(noop(graft.queries.MetricsQueries.queries("g10_ppr")(spark, sfDir)))
    spark.stop()
  }
}
