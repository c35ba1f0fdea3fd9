package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.CheckpointSyntax
import graft.{SparkEntry, Tables}

/** Dev probe (r12, VERDICT item 1 rider): t_rrf_fusion runs the
  * tokenizer kernel THREE times — once inside ranker A's pruned
  * qtermPostings checkpoint and twice inside ranker B's nllScores
  * (whose recompute-beats-checkpoint verdict was measured for TWO
  * consumers of the exploded rows, not three tokenize passes). A/B the
  * standing form against a FUSED form: ONE tokenize pass checkpointed
  * as the full (doc_id, dl, tfm) MAP table (dl stays a row-local map
  * fold — the shape that keeps ranker A's dl join retired), with both
  * rankers exploding from it. Same JVM, alternating GC-separated
  * reps.
  *
  * r15 (directive 4 re-probe, on ProbeHarness): adds the EXPLODED
  * variant — the checkpoint holds (doc_id, term, tf) rows (the shape
  * that won for dedup_lsh_recall in r14) instead of the map table.
  * Measured verdict lives on t_rrf_fusion's scaladoc in
  * CurationQueries.scala: exploded LOSES ~45% (med 4.21 s / 22 jobs
  * vs standing 2.93 s / 16); standing form stays. */
object ProfileRrf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(300)
    }

    val rrfTerms = Seq("customer", "query", "batch")
    val rrfListK = 20
    val rrfOutK = 10
    val bm25ScoreSql =
      "CAST(floor(CAST(1000000 AS DOUBLE) " +
        "* ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) " +
        "* (tf * CAST(2.2 AS DOUBLE) " +
        "/ (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) " +
        "+ CAST(0.75 AS DOUBLE) * dl / avgdl)))) AS BIGINT)"
    val lnqSql =
      "CAST(floor(CAST(1000000 AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS BIGINT)"
    val lnqTotSql =
      "CAST(floor(CAST(1000000 AS DOUBLE) * ln(CAST(tot AS DOUBLE))) AS BIGINT)"

    def fused(): DataFrame = {
      val docs = t0()
      // ONE tokenize pass: full map + row-local dl, checkpointed
      val pd = docs.select(col("doc_id"),
          expr("tf_map(ascii_alpha_tokens(text, 3))").as("tfm"))
        .select(col("doc_id"),
          expr("aggregate(map_values(tfm), 0L, (a, x) -> a + CAST(x AS LONG))").as("dl"),
          col("tfm"))
        .checkpointed()
      val stats = pd.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("tot_dl"))
      // ranker A: row-local prune of the checkpointed map
      val posted = pd.select(col("doc_id"), col("dl"),
          explode(map_filter(col("tfm"), (k, _) => k.isin(rrfTerms: _*)))
            .as(Seq("term", "tf")))
        .withColumn("tf", col("tf").cast("long"))
      val dft = posted.groupBy("term").agg(count(lit(1)).as("df"))
      val bmScored = posted
        .join(broadcast(dft), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("CAST(tot_dl AS DOUBLE) / n_docs"))
        .select(col("doc_id"), expr(bm25ScoreSql).as("s_fp"))
        .groupBy("doc_id").agg(sum("s_fp").as("bm_fp"))
      val bmTop = bmScored
        .orderBy(col("bm_fp").desc, col("doc_id")).limit(rrfListK)
        .withColumn("bm_rank", row_number()
          .over(Window.orderBy(col("bm_fp").desc, col("doc_id"))))
        .select("doc_id", "bm_rank")
      // ranker B: explode the SAME checkpointed map (twice — cnt side
      // and scoring side — but from materialized maps, not re-tokenize)
      val tf = pd.select(col("doc_id"),
          explode(col("tfm")).as(Seq("term", "tf")))
        .withColumn("tf", col("tf").cast("long"))
      val cnt = tf.groupBy("term").agg(sum(col("tf")).as("cnt"))
      val tot = cnt.agg(sum(col("cnt")).as("tot"))
      val qTop = tf.join(cnt, Seq("term"))
        .select(col("doc_id"), col("tf"), expr(lnqSql).as("lnq"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("lnq")).as("sum_fp"),
          sum(col("tf")).as("dl"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("dl"),
          (col("dl") * expr(lnqTotSql) - col("sum_fp")).as("nll_fp"))
        .withColumn("q_fp", expr("nll_fp div dl"))
        .select(col("doc_id"), col("q_fp"))
        .orderBy(col("q_fp").asc, col("doc_id")).limit(rrfListK)
        .withColumn("q_rank", row_number()
          .over(Window.orderBy(col("q_fp").asc, col("doc_id"))))
        .select("doc_id", "q_rank")
      bmTop.join(qTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("bm_rank"), lit(0)).as("bm_rank"),
          coalesce(col("q_rank"), lit(0)).as("q_rank"))
        .withColumn("rrf_fp",
          expr("CASE WHEN bm_rank > 0 THEN 1000000000 div (60 + bm_rank) ELSE 0 END") +
          expr("CASE WHEN q_rank > 0 THEN 1000000000 div (60 + q_rank) ELSE 0 END"))
        .orderBy(col("rrf_fp").desc, col("doc_id")).limit(rrfOutK)
        .select(col("doc_id"), col("rrf_fp"),
          col("bm_rank").cast("int").as("bm_rank"),
          col("q_rank").cast("int").as("q_rank"))
        .orderBy("doc_id")
    }
    /** r15 variant (directive 4 re-probe): ONE tokenize pass
      * checkpointed as the EXPLODED (doc_id, term, tf) rows — the
      * shape that WON for dedup_lsh_recall in r14 — with both rankers
      * reading it. n_docs comes from a metadata-fast count of the base
      * table (the exploded rows drop zero-token docs, which
      * qtermPostings counts); ranker A's dl arrives via a keyed join
      * with the per-doc sums instead of the standing row-local map
      * fold. */
    def exploded(): DataFrame = {
      val docs = t0()
      val tok = docs.select(col("doc_id"),
          explode(expr("tf_map(ascii_alpha_tokens(text, 3))"))
            .as(Seq("term", "tf")))
        .withColumn("tf", col("tf").cast("long"))
        .checkpointed()
      val perdoc = tok.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val stats = perdoc
        .agg(coalesce(sum(col("dl")), lit(0L)).as("tot_dl"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      val posted = tok.filter(col("term").isin(rrfTerms: _*))
        .join(perdoc, Seq("doc_id"))
      val dft = posted.groupBy("term").agg(count(lit(1)).as("df"))
      val bmScored = posted
        .join(broadcast(dft), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("CAST(tot_dl AS DOUBLE) / n_docs"))
        .select(col("doc_id"), expr(bm25ScoreSql).as("s_fp"))
        .groupBy("doc_id").agg(sum("s_fp").as("bm_fp"))
      val bmTop = bmScored
        .orderBy(col("bm_fp").desc, col("doc_id")).limit(rrfListK)
        .withColumn("bm_rank", row_number()
          .over(Window.orderBy(col("bm_fp").desc, col("doc_id"))))
        .select("doc_id", "bm_rank")
      val cnt = tok.groupBy("term").agg(sum(col("tf")).as("cnt"))
      val tot = cnt.agg(sum(col("cnt")).as("tot"))
      val qTop = tok.join(cnt, Seq("term"))
        .select(col("doc_id"), col("tf"), expr(lnqSql).as("lnq"))
        .groupBy("doc_id")
        .agg(sum(col("tf") * col("lnq")).as("sum_fp"),
          sum(col("tf")).as("dl"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("dl"),
          (col("dl") * expr(lnqTotSql) - col("sum_fp")).as("nll_fp"))
        .withColumn("q_fp", expr("nll_fp div dl"))
        .select(col("doc_id"), col("q_fp"))
        .orderBy(col("q_fp").asc, col("doc_id")).limit(rrfListK)
        .withColumn("q_rank", row_number()
          .over(Window.orderBy(col("q_fp").asc, col("doc_id"))))
        .select("doc_id", "q_rank")
      bmTop.join(qTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("bm_rank"), lit(0)).as("bm_rank"),
          coalesce(col("q_rank"), lit(0)).as("q_rank"))
        .withColumn("rrf_fp",
          expr("CASE WHEN bm_rank > 0 THEN 1000000000 div (60 + bm_rank) ELSE 0 END") +
          expr("CASE WHEN q_rank > 0 THEN 1000000000 div (60 + q_rank) ELSE 0 END"))
        .orderBy(col("rrf_fp").desc, col("doc_id")).limit(rrfOutK)
        .select(col("doc_id"), col("rrf_fp"),
          col("bm_rank").cast("int").as("bm_rank"),
          col("q_rank").cast("int").as("q_rank"))
        .orderBy("doc_id")
    }

    def t0(): DataFrame = Tables.fanOut(Tables.load(spark, sfDir, "documents"))
    val standing = () => SparkEntry.queries("t_rrf_fusion")(spark, sfDir)

    noop(standing()); noop(fused()); noop(exploded()) // warm
    val a = standing().collect().map(_.toString).toSeq
    val b = fused().collect().map(_.toString).toSeq
    val c = exploded().collect().map(_.toString).toSeq
    println(s"[equiv] fused=${a == b} exploded=${a == c} rows=${a.size}")
    require(a == b && a == c, "a variant diverges — A/B void")

    val h = new ProbeHarness(spark, "rrf")
    val as = collection.mutable.Buffer[Double]()
    val bs = collection.mutable.Buffer[Double]()
    val cs = collection.mutable.Buffer[Double]()
    for (_ <- 1 to 4) {
      as += h.time("standing")(standing())
      bs += h.time("fused")(fused())
      cs += h.time("exploded")(exploded())
    }
    def report(tag: String, xs: collection.mutable.Buffer[Double]): Unit =
      println(f"[ab] $tag%-9s min ${xs.min}%6.3f med ${xs.sorted.apply(xs.size / 2)}%6.3f  (${xs.map(x => f"$x%.2f").mkString(" ")})")
    report("standing", as)
    report("fused", bs)
    report("exploded", cs)
    spark.stop()
  }
}
