package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profiler: where do the dedup CC-family seconds go at sf0.1? */
object ProfileCc {
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
    def q(name: String) = graft.queries.DedupQueries.queries(name)(spark, sfDir)

    // warm
    time("warmup cc_clusters")(noop(q("dedup_cc_clusters")))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (r <- 1 to 2) {
      var pairs: DataFrame = null
      time(s"[$r] minhash pairs checkpoint") {
        pairs = graft.operators.DedupOps.minHashLshPairs(
          {
          val d = graft.Tables.fanOut(docs)
            .select(col("doc_id"), col("lang"), substring(col("text"), 1, 200).as("t"))
          val planted = d.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("lang"),
              concat(col("t"), lit(" near dup tail")).as("t"))
          d.unionByName(planted)
        }, "doc_id", "t",
          shingleK = 3, numHashes = 8, bands = 2).localCheckpoint(true)
      }
      time(s"[$r] cc on materialized pairs") {
        noop(graft.operators.GraphOps.connectedComponents(pairs, "id_a", "id_b"))
      }
      pairs.unpersist()
      time(s"[$r] cc_clusters full")(noop(q("dedup_cc_clusters")))
      time(s"[$r] cc_best full")(noop(q("dedup_cc_best")))
    }
    spark.stop()
  }
}
