package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the Unicode kernels (UnicodeExprs.scala) on the cases the oracle
  * gate relies on (decomposed→composed BMP sequences) plus the edges the
  * fixture can't reach: astral (surrogate-pair) codepoints, where Spark's
  * builtin `length` diverges from codepoint counting, empty strings, and
  * null propagation through the codegen path.
  */
class UnicodeExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sqlExpr: String, input: String): Any = {
    import spark.implicits._
    Seq(Option(input)).toDF("s").selectExpr(sqlExpr).collect()(0).get(0)
  }

  private val decomposed = "éôå" // é ô å, decomposed
  private val composed = "éôå"

  test("nfc_normalize composes decomposed sequences and is identity on NFC text") {
    assert(one("nfc_normalize(s)", "abc " + decomposed) == "abc " + composed)
    assert(one("nfc_normalize(s)", "plain ascii") == "plain ascii")
    assert(one("nfc_normalize(s)", composed) == composed)
    assert(one("nfc_normalize(s)", "") == "")
    assert(one("nfc_normalize(s)", null) == null)
    // astral chars pass through untouched
    assert(one("nfc_normalize(s)", "x🎉y") == "x🎉y")
  }

  test("builtin length is codepoint semantics (matches DuckDB length), astral included") {
    // The fn_nfc_normalize / t_grapheme_len oracles lean on this: no
    // separate codepoint kernel is needed because Spark's length walks
    // UTF-8 lead bytes (UTF8String.numChars), not UTF-16 units.
    assert(one("length(s)", "abc") == 3)
    assert(one("length(s)", decomposed) == 6)
    assert(one("length(s)", composed) == 3)
    assert(one("length(s)", "🎉") == 1) // one codepoint, 2 UTF-16 units
  }

  test("grapheme_len counts combining sequences as single clusters") {
    assert(one("grapheme_len(s)", "abc") == 3)
    assert(one("grapheme_len(s)", decomposed) == 3) // three clusters
    assert(one("grapheme_len(s)", composed) == 3)
    assert(one("grapheme_len(s)", "x" + "é" * 4) == 5)
    assert(one("grapheme_len(s)", "") == 0)
    assert(one("grapheme_len(s)", null) == null)
    assert(one("grapheme_len(s)", "🎉") == 1) // astral, one cluster
  }

  test("kernels agree with the oracle construction over real corpus text") {
    // Same shape as the fn_nfc_normalize / t_grapheme_len queries: ASCII
    // corpus prefix + decomposed suffix; NFC shrinks by exactly the 3
    // composed pairs, grapheme count = cp count - repeats.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("raw", concat(substring(col("text"), 1, 60), lit(decomposed)))
      .selectExpr(
        "length(raw) AS pre",
        "length(nfc_normalize(raw)) AS post",
        "grapheme_len(raw) AS g")
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(r.getInt(0) - r.getInt(1) == 3)
      assert(r.getInt(2) == r.getInt(0) - 3)
    }
  }
}
