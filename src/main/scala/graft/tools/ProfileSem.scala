package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profiler: where do dedup_semantic's ~2.7 s go at sf0.1? Not part
  * of the query surface. */
object ProfileSem {
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

    val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def corpus(fan: Boolean): DataFrame = {
      val e = if (fan) graft.Tables.fanOut(e0) else e0
      val planted = e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
      e.select("vec_id", "embedding", "label").unionByName(planted)
    }
    time("warmup corpus noop")(noop(corpus(true)))
    for (r <- 1 to 2) {
      var cents: Seq[(Long, Array[Double])] = null
      time(s"[$r] fit fanned") {
        cents = graft.operators.KMeansOps.fit(corpus(true), "vec_id", "embedding", 8, 2, 64)
      }
      time(s"[$r] fit unfanned") {
        cents = graft.operators.KMeansOps.fit(corpus(false), "vec_id", "embedding", 8, 2, 64)
      }
      var cells: DataFrame = null
      time(s"[$r] assign+checkpoint fanned") {
        cells = graft.operators.KMeansOps.assign(corpus(true), cents, "embedding", 64)
          .withColumnRenamed("cell", "cell").localCheckpoint(true)
      }
      time(s"[$r] pairs+anti noop") {
        val pairs = graft.operators.SimilarityOps.cosineNearDupPairs(
          cells, "vec_id", "embedding", "cell", 0.999)
        val deleted = pairs.select(col("id_b").as("vec_id")).distinct()
        noop(cells.join(deleted, Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("cell")))
      }
      cells.unpersist()
    }
    time("dedup_semantic full")(noop(
      graft.queries.DedupQueries.queries("dedup_semantic")(spark, sfDir)))
    time("dedup_semantic warm")(noop(
      graft.queries.DedupQueries.queries("dedup_semantic")(spark, sfDir)))
    time("ann_kmeans_cells full")(noop(
      graft.queries.DedupQueries.queries("ann_kmeans_cells")(spark, sfDir)))
    spark.stop()
  }
}
