package graft.tools

import graft.{Sessions, SparkEntry, Tables}

/** Dev audit: flag registered queries whose EXECUTED PLAN contains the
  * same expensive row-local kernel more than once — the recompute
  * defect class the r10 retrieval rewrite fixed (a lazily-shared
  * subtree re-runs its tokenize/hash/shingle kernel once per consumer;
  * a checkpoint runs it once). A multiple count is a CANDIDATE, not a
  * verdict: some duplicates are measured-cheaper than materializing
  * (nllScores), some are different inputs to the same kernel. Prints
  * query -> kernel -> count for every kernel appearing >= 2 times.
  * Not part of the query surface. */
object AuditRecompute {
  private val kernels = Seq(
    "tf_map", "ascii_tokens", "ascii_alpha_tokens", "kgrams",
    "distinct_kgrams", "winnow", "minhash", "simhash", "rp_project",
    "token_count", "redact_pii", "lang_id", "grapheme", "sent_split",
    "vi_normalize", "normalize_name", "unicode_unescape", "levenshtein",
    "BatchEvalPython", "md5", "xxhash")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    names.foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable => s"<plan failed: ${e.getMessage}>" }
      val lower = plan.toLowerCase
      val hits = kernels.flatMap { k =>
        val n = k.toLowerCase.r.findAllIn(lower).length
        if (n >= 2) Some(s"$k=$n") else None
      }
      if (hits.nonEmpty) {
        flagged += 1
        println(s"[audit] $name  ${hits.mkString(" ")}")
      }
    }
    println(s"[audit] flagged $flagged of ${names.size}")
    spark.stop()
  }
}
