package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: does the coEdges self-join auto-broadcast its fact side
  * (the a19 defect), and does shuffle_hash beat it? */
object ProfileCoE {
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
    def op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    def coPlain = {
      val a = op.select(col("o"), col("p").as("p1"))
      val b = op.select(col("o"), col("p").as("p2"))
      a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
    }
    def coShj = {
      val a = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
      val b = op.select(col("o"), col("p").as("p2"))
      a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
    }
    noop(coPlain) // warm
    for (r <- 1 to 2) {
      time(s"[$r] coEdges plain distinct ckpt") {
        coPlain.distinct().localCheckpoint(true).unpersist()
      }
      time(s"[$r] coEdges shj distinct ckpt") {
        coShj.distinct().localCheckpoint(true).unpersist()
      }
    }
    println("=== plain plan join nodes ===")
    val plan = coPlain.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println(l.trim.take(120)))
    spark.stop()
  }
}
