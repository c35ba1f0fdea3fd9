package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency operators: decisions about a line/fragment that
  * depend on how many DOCUMENTS it appears in — the C4/RefinedWeb-style
  * boilerplate pass (navigation chrome, cookie banners, shared
  * headers/footers repeat across a crawl; real prose doesn't).
  */
object CorpusOps {

  /** Intra-document repetition signals (the Gopher-family quality
    * filters): per document, the fraction of non-blank lines that are
    * repeats of an earlier line, and the share of the most common token
    * bigram among all bigram occurrences — high values of either mark
    * templated/spammy text. Shapes: two per-doc aggregations (one
    * shuffle each on (doc, line) / (doc, gram)), joined on doc id; no
    * corpus-wide state, so the operator scales linearly and partitions
    * by document hash. Divisions are double-cast on both engines for a
    * bit-exact oracle. */
  def repetitionSignals(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lineStats = docs
      .select(col(idCol), explode(expr(
        s"filter(split($textCol, '\n'), x -> trim(x) <> '')")).as("__line"))
      .groupBy(col(idCol), col("__line")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_lines"),
        (sum(col("__c")) - count(lit(1))).as("n_dup_lines"))
    val gramStats = docs
      .withColumn("__toks",
        expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)"))
      .select(col(idCol),
        explode(DedupOps.shinglesOfTokens("__toks", 2)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("top_bigram_cnt"), sum(col("__c")).as("n_bigrams"))
    lineStats.join(gramStats, Seq(idCol))
      .select(col(idCol), col("n_lines"), col("n_dup_lines"),
        (col("n_dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
        col("top_bigram_cnt"), col("n_bigrams"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** Remove lines that occur in at least `minDocs` distinct documents,
    * preserving each document's remaining line order.
    *
    * Scale shape (100 TB): pass 1 aggregates distinct-doc counts with
    * ONE shuffle on the line hash (map-side partial counts); the
    * surviving boilerplate set is tiny BY CONSTRUCTION (a line must
    * recur across >= minDocs documents to qualify), so pass 2's
    * left_anti join broadcasts it against the exploded lines — AQE picks
    * the broadcast automatically at that size. Reassembly sorts
    * in-group: array_sort over (pos, line) structs inside the collected
    * group, not a global sort. Blank lines are never treated as
    * boilerplate (they'd match across every document trivially) — they
    * are preserved verbatim through reassembly. A document consisting
    * ENTIRELY of boilerplate drops out of the result (it has no content
    * left to carry). */
  /** Benchmark-contamination scores: for every document, the fraction of
    * its DISTINCT token `shingleK`-grams that appear anywhere in the
    * benchmark set — the standard eval-decontamination signal. Same
    * tokenizer and shingle construction as the MinHash dedup family, so
    * the DuckDB oracle reuses that replay verbatim.
    *
    * Scale shape: the benchmark n-gram set is SMALL BY DEFINITION (eval
    * suites are a few MB against a 100 TB corpus) — broadcast-hinted, so
    * the corpus side never shuffles its n-grams. Per-doc n-gram
    * DISTINCTness is row-local (`array_distinct` before the explode, a
    * doc's grams all live in its own row) — a `.distinct()` there would
    * shuffle every (doc, gram) row for a result each row already owns.
    * The corpus side's only exchange is the final per-doc count
    * aggregation of broadcast-join outputs. */
  def contaminationScores(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, shingleK: Int = 3): DataFrame = {
    def grams(df: DataFrame, textC: String, keep: Seq[Column]): DataFrame =
      df.withColumn("__toks",
          expr(s"regexp_extract_all(lower($textC), '[a-z0-9]+', 0)"))
        .select(keep :+ explode(array_distinct(
          DedupOps.shinglesOfTokens("__toks", shingleK))).as("__ng"): _*)
    val benchSet = grams(bench, benchTextCol, Seq.empty)
      .select(col("__ng")).distinct() // cross-DOC distinct: not row-local
      .withColumn("__hit", lit(1))
    val docGrams = grams(docs, textCol, Seq(col(idCol)))
    docGrams.join(broadcast(benchSet), Seq("__ng"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams"))
  }

  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String, minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .filter(trim(col("__line")) =!= "")
      .groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__line")
    val kept = lines.join(boiler,
      lines("__line") === boiler("__line"), "left_anti")
    kept
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__pos"), col("__line"))).as("__parts"))
      .select(col(idCol),
        array_join(
          transform(array_sort(col("__parts")), p => p("__line")),
          "\n").as("text"))
  }
}
