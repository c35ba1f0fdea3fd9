package graft

/** Benchmark main: runs the headline queries against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is forced to full materialization with a noop-format write —
  * `.count()` would let Catalyst prune every column and skip projection /
  * UDF work entirely, under-measuring by orders of magnitude.
  */
object Bench {
  /** Headline subset: one representative per operator family (scan+agg,
    * join, window, merge, dedup, ANN, text) — the queries whose plans
    * decide 100 TB viability. Everything else is correctness-only. */
  val headline: Seq[String] = Seq(
    "a4_sum", "a5_cond_count", "a10_ordered_concat",
    "j1_inner_equi", "j3_upsert", "j5_semi", "j7_lineid_arith",
    "w1_row_number", "o4_group_sample",
    "dedup_exact", "dedup_minhash_lsh",
    "ann_brute_topk", "ann_bucketed_topk", "ann_ivf_topk",
    "t_lang_id", "t_quality", "t_token_count", "a8_corpus_wer")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    val qs = headline.filter(SparkEntry.queries.contains) match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted
      case hs    => hs
    }
    val results = qs.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
