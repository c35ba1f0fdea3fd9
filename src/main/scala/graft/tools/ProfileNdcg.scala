package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Checkpoints.CheckpointSyntax
import graft.{SparkEntry, Tables}

/** Dev probe (r12, VERDICT item 1): t_ndcg_eval's floor claim was
  * inherited from the retrieval family, never measured on itself.
  * (a) count the Spark jobs one run launches (is it a sequential
  * small-job chain?), (b) A/B the standing form against a FOLDED form
  * where one aggregate over the shared postings produces BOTH rel and
  * score_fp per (q_id, doc_id) — so the rel groupBy, the ranked⋈rel
  * join subtree recompute, and the ideal branch's second rel recompute
  * all collapse onto one checkpointed table. Same JVM, alternating
  * GC-separated reps. */
object ProfileNdcg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(300)
    }

    // ---- folded variant (mirrors RetrievalQueries.ndcg, one perDoc agg)
    val bm25K = 5
    val bm25Queries: Seq[(Int, String)] = Seq(
      1 -> "spark", 1 -> "join", 2 -> "hash", 2 -> "merge",
      3 -> "window", 3 -> "sort", 4 -> "customer", 4 -> "query",
      4 -> "batch", 5 -> "dup", 5 -> "scan")
    val bm25ScoreSql =
      "CAST(floor(CAST(1000000 AS DOUBLE) " +
        "* ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) " +
        "* (tf * CAST(2.2 AS DOUBLE) " +
        "/ (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) " +
        "+ CAST(0.75 AS DOUBLE) * dl / avgdl)))) AS BIGINT)"
    val ndcgWSql =
      "CAST(1000000000000 div CAST(floor(CAST(1000000 AS DOUBLE) " +
        "* ln(CAST(rank + 1 AS DOUBLE))) AS BIGINT) AS BIGINT)"
    def folded(): DataFrame = {
      val docs = Tables.fanOut(Tables.load(spark, sfDir, "documents"))
      val qdf = bm25Queries.toDF("q_id", "term")
      val pd = docs.select(col("doc_id"),
          expr("tf_map(ascii_alpha_tokens(text, 3))").as("tfm"))
        .select(col("doc_id"),
          expr("aggregate(map_values(tfm), 0L, (a, x) -> a + CAST(x AS LONG))").as("dl"),
          map_filter(col("tfm"),
            (k, _) => k.isin(bm25Queries.map(_._2).distinct: _*)).as("tfq"))
        .checkpointed()
      val dt = pd.select(col("doc_id"), col("dl"),
          explode(col("tfq")).as(Seq("term", "tf")))
        .withColumn("tf", col("tf").cast("long"))
      val stats = pd.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("tot_dl"))
      // dft from dt (already unique per (doc, term)) — no distinct
      val dft = dt.groupBy("term").agg(count(lit(1)).as("df"))
      val perDoc = dt.join(broadcast(qdf), Seq("term"))
        .join(broadcast(dft), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("CAST(tot_dl AS DOUBLE) / n_docs"))
        .select(col("q_id"), col("doc_id"), expr(bm25ScoreSql).as("s_fp"))
        .groupBy("q_id", "doc_id")
        .agg(sum(col("s_fp")).as("score_fp"), count(lit(1)).as("rel"))
        .checkpointed()
      val ranked = graft.operators.TopKOps.topKByValue(
        perDoc, Seq("q_id"), col("score_fp"), col("doc_id"), bm25K,
        orderName = "score_fp", tieName = "doc_id")
      val dcg = perDoc.join(broadcast(ranked.select("q_id", "doc_id", "rank")),
          Seq("q_id", "doc_id"))
        .select(col("q_id"), (col("rel") * expr(ndcgWSql)).as("g"))
        .groupBy("q_id").agg(sum(col("g")).as("dcg_fp"))
      val ideal = graft.operators.TopKOps.topKByValue(
          perDoc, Seq("q_id"), col("rel"), col("doc_id"), bm25K,
          orderName = "rel", tieName = "doc_id")
        .select(col("q_id"), (col("rel") * expr(ndcgWSql)).as("g"))
        .groupBy("q_id").agg(sum(col("g")).as("idcg_fp"))
      dcg.join(ideal, Seq("q_id"))
        .select(col("q_id"), col("dcg_fp"), col("idcg_fp"),
          expr("CAST(CASE WHEN idcg_fp > 0 THEN (dcg_fp * 1000000) div idcg_fp END AS BIGINT)")
            .as("ndcg_ppm"))
        .orderBy("q_id")
    }

    // ---- (a) job-structure census of the standing form
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val listener = new SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        t0.put(js.jobId, System.nanoTime())
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (s"${js.stageInfos.size} stages  $d", -1L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val dt = System.nanoTime() - Option(t0.get(je.jobId)).getOrElse(0L)
        val (d, _) = jobs.getOrDefault(je.jobId, ("?", -1L))
        jobs.put(je.jobId, (d, dt))
      }
    }
    def census(label: String)(mk: => DataFrame): Unit = {
      cool(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      noop(mk)
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(s"=== $label: ${jobs.size} jobs ===")
      scala.jdk.CollectionConverters.MapHasAsScala(jobs).asScala
        .toSeq.sortBy(_._1).foreach { case (id, (d, ns)) =>
          println(f"[job] #$id%-4d ${ns / 1e9}%6.3f s  $d")
        }
    }

    val standing = () => SparkEntry.queries("t_ndcg_eval")(spark, sfDir)
    noop(standing()); noop(folded()) // warm
    census("standing t_ndcg_eval")(standing())
    census("folded t_ndcg_eval")(folded())

    // equivalence check before timing means anything
    val a = standing().collect().map(_.toString).toSeq
    val b = folded().collect().map(_.toString).toSeq
    println(s"[equiv] same=${a == b} rows=${a.size}")
    require(a == b, "folded variant diverges — A/B void")

    // ---- (b) alternating A/B
    def time(f: => DataFrame): Double = {
      cool()
      val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
    }
    val as = collection.mutable.Buffer[Double]()
    val bs = collection.mutable.Buffer[Double]()
    for (_ <- 1 to 4) { as += time(standing()); bs += time(folded()) }
    println(f"[ab] standing min ${as.min}%6.3f med ${as.sorted.apply(as.size / 2)}%6.3f  (${as.map(x => f"$x%.2f").mkString(" ")})")
    println(f"[ab] folded   min ${bs.min}%6.3f med ${bs.sorted.apply(bs.size / 2)}%6.3f  (${bs.map(x => f"$x%.2f").mkString(" ")})")
    spark.stop()
  }
}
