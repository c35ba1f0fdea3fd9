package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Dev profiler: times the sub-plans of the ANN queries to locate where
  * wall-clock goes at sf0.1 (the bench shows ~2.5-4 s on 2000 vectors,
  * which cannot be data cost). Not part of the query surface. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("scan+count")(e.count())
    time("scan+count warm")(e.count())
    val bucketed = e.withColumn("bucket", SimilarityOps.lshBucket("embedding", 8, 64))
    time("bucket assign")(bucketed.write.format("noop").mode("overwrite").save())
    time("bucket assign warm")(bucketed.write.format("noop").mode("overwrite").save())
    val q = e.filter(col("vec_id") < 20)
    val full = SimilarityOps.bucketedTopK(q, e, "vec_id", "embedding", 5, 8, 64)
    time("bucketedTopK cold")(full.write.format("noop").mode("overwrite").save())
    time("bucketedTopK warm")(full.write.format("noop").mode("overwrite").save())
    time("bucketedTopK warm2")(full.write.format("noop").mode("overwrite").save())
    val ivf = SimilarityOps.ivfTopK(e.filter(col("vec_id") < 10), e,
      "vec_id", "embedding", 5, nCells = 16, nProbe = 2)
    time("ivfTopK cold")(ivf.write.format("noop").mode("overwrite").save())
    time("ivfTopK warm")(ivf.write.format("noop").mode("overwrite").save())
    val mt = SimilarityOps.multiTableTopK(q, e, "vec_id", "embedding", 5, 8, 8, 64)
    time("multiTableTopK cold")(mt.write.format("noop").mode("overwrite").save())
    time("multiTableTopK warm")(mt.write.format("noop").mode("overwrite").save())

    // recall sweep for multi-table parameterizations
    {
      val brute = SimilarityOps.bruteTopK(q, e, "vec_id", "embedding", 5)
        .select("q_id", "c_id")
      brute.cache(); val nBrute = brute.count()
      for ((nt, np) <- Seq((8, 8), (8, 6), (16, 6), (8, 4), (4, 6))) {
        val t0 = System.nanoTime()
        val m = SimilarityOps.multiTableTopK(q, e, "vec_id", "embedding", 5, nt, np, 64)
        val hits = brute.join(m.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi").count()
        println(f"[recall] tables=$nt%2d planes=$np%2d recall=${hits * 100.0 / nBrute}%5.1f%% " +
          f"time=${(System.nanoTime() - t0) / 1e9}%5.2f s")
      }
      brute.unpersist()
    }

    // isolate: codegen off / AQE off
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("mt codegen-off")(mt.write.format("noop").mode("overwrite").save())
    time("mt codegen-off warm")(mt.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("mt aqe-off")(mt.write.format("noop").mode("overwrite").save())
    time("mt aqe-off warm")(mt.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // job/stage accounting for one warm run
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = s.stageInfo
        println(f"[profile]   stage ${info.stageId}%3d tasks=${info.numTasks}%4d " +
          f"runTime=${info.taskMetrics.executorRunTime / 1e3}%8.2fs  ${info.name.take(80)}")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
    }
    spark.sparkContext.addSparkListener(listener)
    time("mt accounted")(mt.write.format("noop").mode("overwrite").save())
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(s"[profile] jobs=${jobs.get} stages=${stages.get} taskTime=${taskNanos.get / 1e9}s")
    spark.stop()
  }
}
