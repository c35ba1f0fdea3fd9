package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral pins for the registered corpus-metric queries that read a
  * documents table: a synthetic exact power-law corpus must fit a Zipf
  * slope of ~-1, and the percentile gate must keep exactly the docs at
  * or above the lower-quantile p90 threshold. Both run through the REAL
  * registered query (SparkEntry.queries) against a scratch parquet dir,
  * so the test covers the whole plan, not a private helper. */
class CorpusMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scratch dir holding ONLY documents.parquet with the given rows. */
  private def docsDir(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_metrics").toString
    rows.toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("zipf slope of an exact 1/rank corpus is ~-1e6 ppm") {
    // vocabulary of 40 terms, term r repeated floor(4000/r) times across
    // the corpus: a clean discrete power law with alpha = 1. Words must
    // be pure alpha — the tokenizer treats digits as separators.
    val words = (1 to 40).map(r =>
      s"word${('a' + r / 26).toChar}${('a' + r % 26).toChar}")
    val text = (1 to 40).flatMap(r => Seq.fill(4000 / r)(words(r - 1)))
    // spread tokens over a few docs (the query aggregates corpus-wide)
    val docs = text.grouped(2000).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), 1L) }.toSeq
    val dir = docsDir(docs)
    val r = graft.SparkEntry.queries("t_zipf_slope")(spark, dir).collect().head
    assert(r.getLong(0) == 40L, "vocabulary size")
    val slope = r.getLong(1)
    assert(slope > -1100000L && slope < -900000L,
      s"expected ~-1e6 ppm slope, got $slope")
  }

  test("percentile gate keeps exactly the docs at/above the p90 lower quantile") {
    // n_chars 1..100 once each: N=100, ceil(0.9*100)=90 -> threshold is
    // the 90th smallest value = 90; survivors are n_chars in [90, 100].
    val docs = (1L to 100L).map(i => (i, "t", i))
    val dir = docsDir(docs)
    val got = graft.SparkEntry.queries("t_percentile_gate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (90L to 100L).map(i => (i, i)))
  }

  test("percentile gate threshold lands on a duplicated value correctly") {
    // 95 docs at 10 chars, 5 at 99: ceil(0.9*100)=90 <= 95 -> threshold
    // is 10 and EVERYTHING survives (lower-quantile semantics, no
    // interpolation).
    val docs = (1L to 95L).map((_, "t", 10L)) ++ (96L to 100L).map((_, "t", 99L))
    val dir = docsDir(docs)
    val got = graft.SparkEntry.queries("t_percentile_gate")(spark, dir).count()
    assert(got == 100L)
  }
}
