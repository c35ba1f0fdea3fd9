package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: times the sub-plans of the graph-family queries
  * (g1/g3/g6 and their shared fixture edge generators) to locate where
  * wall-clock goes at sf0.1. Not part of the query surface. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    // --- co-purchase edge fixture (g2/g3) -------------------------
    def coEdges: DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val a = op.select(col("o"), col("p").as("p1"))
      val b = op.select(col("o"), col("p").as("p2"))
      a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
    }
    time("coEdges noop (warmup)")(noop(coEdges))
    time("coEdges noop")(noop(coEdges))
    time("coEdges.distinct noop")(noop(coEdges.distinct()))
    var e: DataFrame = null
    time("coEdges.distinct checkpoint") {
      e = coEdges.distinct().localCheckpoint(true)
    }
    var deg: DataFrame = null
    time("deg checkpoint") {
      deg = e.select(col("p1").as("v")).union(e.select(col("p2").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d")).localCheckpoint(true)
    }
    val sym = e.union(e.select(col("p2").as("p1"), col("p1").as("p2")))
    val tail = sym
      .join(broadcast(deg.select(col("v").as("p1"), col("d").as("x"))), Seq("p1"))
      .join(broadcast(deg.select(col("v").as("p2"), col("d").as("y"))), Seq("p2"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
    time("g3 tail (joins+agg)")(noop(tail))
    time("g3 tail warm")(noop(tail))

    // --- bipartite supply graph fixture (g1/g4/g6) ----------------
    def fwd: DataFrame = li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst")).distinct()
    time("fwd distinct noop")(noop(fwd))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    time("pagerank 3 iters")(noop(
      graft.operators.PageRankOps.pageRank(edges, "src", "dst", iters = 3,
        assumeDistinct = true)))
    time("pagerank 3 iters warm")(noop(
      graft.operators.PageRankOps.pageRank(edges, "src", "dst", iters = 3,
        assumeDistinct = true)))

    // labelProp on co-purchase graph (g6's input)
    def coE: DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val a = op.select(col("o"), col("p").as("p1"))
      val b = op.select(col("o"), col("p").as("p2"))
      a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
    }
    time("labelProp 2 rounds")(noop(
      graft.operators.GraphOps.labelPropagation(coE, "p1", "p2", rounds = 2)))
    time("labelProp 2 rounds warm")(noop(
      graft.operators.GraphOps.labelPropagation(coE, "p1", "p2", rounds = 2)))

    // per-piece labelProp breakdown on the checkpointed edge set
    val symLp = e.select(col("p1").as("src"), col("p2").as("dst"))
      .union(e.select(col("p2").as("src"), col("p1").as("dst")))
    var labels = symLp.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    time("lp seed labels")(noop(labels))
    for (r <- 1 to 2) {
      val cnt = symLp
        .join(labels.select(col("v").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("v"), col("label"))
        .agg(count(lit(1)).as("c"))
      labels = cnt.groupBy("v")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v"), (-col("m.nl")).as("label"))
      time(s"lp through round $r")(noop(labels))
    }
    spark.stop()
  }
}
