package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: stage timings inside g2_triangles (coEdges fixture,
  * canonical distinct, degree, orientation, adjacency, closing
  * intersect) to find the dominant cost at sf0.1. Not part of the
  * query surface. */
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def coEdges: DataFrame = {
      val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val a = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
      val b = op.select(col("o"), col("p").as("p2"))
      a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
    }
    time("warmup coEdges")(noop(coEdges))
    var e: DataFrame = null
    time("e = coEdges.distinct.checkpoint") {
      e = coEdges
        .select(least(col("p1"), col("p2")).as("a"),
          greatest(col("p1"), col("p2")).as("b"))
        .distinct().localCheckpoint(true)
    }
    println(s"[profile] |e| = ${e.count()}")
    var deg: DataFrame = null
    time("deg checkpoint") {
      deg = e.select(col("a").as("v_")).union(e.select(col("b").as("v_")))
        .groupBy("v_").agg(count(lit(1)).as("d")).localCheckpoint(true)
    }
    println(s"[profile] |deg| = ${deg.count()}")
    var oriented: DataFrame = null
    time("oriented checkpoint") {
      val withDeg = e
        .join(broadcast(deg.select(col("v_").as("a"), col("d").as("da"))), Seq("a"))
        .join(broadcast(deg.select(col("v_").as("b"), col("d").as("db"))), Seq("b"))
      oriented = withDeg.select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .localCheckpoint(true)
    }
    var adj: DataFrame = null
    time("adj checkpoint") {
      adj = oriented.groupBy(col("src"))
        .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
        .localCheckpoint(true)
    }
    println(s"[profile] |adj| = ${adj.count()}")
    time("closing intersect + agg") {
      noop(oriented
        .join(broadcast(adj.select(col("src"), col("nbrs").as("ns"))), Seq("src"))
        .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nd"))),
          Seq("dst"))
        .select(size(array_intersect(col("ns"), col("nd"))).as("k"))
        .agg(coalesce(sum(col("k")), lit(0L)).as("n_triangles")))
    }
    spark.stop()
  }
}
