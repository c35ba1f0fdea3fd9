package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins DedupOps.containmentPairs: a short doc quoted inside a long one
  * scores ~1e6 containment even when Jaccard is tiny (the asymmetry the
  * operator exists for), disjoint docs never pair, identical docs score
  * exactly 1e6, and the df cap drops saturated grams from BOTH the
  * postings and the size universe. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairs(docs: Seq[(Long, String)], dfCap: Int = 50,
      minPpm: Long = 600000L): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    DedupOps.containmentPairs(docs.toDF("doc_id", "text"), "doc_id",
        expr("distinct_kgrams(ascii_tokens(text), 3)"), dfCap, minPpm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private val quote = "the quick brown fox jumps over the lazy dog tonight"
  private val longDoc = "editorial preamble section one " + quote +
    " closing remarks follow here with unrelated commentary material"

  test("subset quote scores full containment; Jaccard would dilute it") {
    val got = pairs(Seq((1L, quote), (2L, longDoc)))
    assert(got.size == 1)
    val (a, b, shared, ppm) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(ppm == 1000000L, s"quote containment should be exact: $ppm")
    // Jaccard over the same shingle universe is far below the threshold —
    // the asymmetry claim, computed from the same operator outputs.
    import spark.implicits._
    val sizes = Seq((1L, quote), (2L, longDoc)).toDF("doc_id", "text")
      .select(col("doc_id"),
        size(expr("distinct_kgrams(ascii_tokens(text), 3)")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val jaccard = shared.toDouble / (sizes(1L) + sizes(2L) - shared)
    assert(jaccard < 0.6, s"fixture should make Jaccard miss: $jaccard")
  }

  test("identical docs score exactly 1e6; disjoint docs never pair") {
    val got = pairs(Seq((1L, quote), (2L, quote),
      (3L, "completely different words about maritime navigation charts")))
    assert(got == Seq((1L, 2L, got.head._3, 1000000L)))
  }

  test("df cap removes saturated grams from postings AND sizes") {
    // gram 'x y z' appears in all 3 docs; with cap=2 it is dropped, so
    // docs 1/2 pair only through their OTHER shared shingles.
    val docs = Seq(
      (1L, "x y z alpha beta gamma"),
      (2L, "x y z alpha beta gamma"),
      (3L, "x y z different tail words"))
    val capped = pairs(docs, dfCap = 2, minPpm = 1L)
    // (1,2) still fully contained via their unique shingles; (1,3)/(2,3)
    // shared ONLY the capped shingles -> no pair row at all.
    assert(capped.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    assert(capped.head._4 == 1000000L)
  }

  test("null text drops out instead of crashing") {
    import spark.implicits._
    val df = Seq((1L, Some(quote)), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(df, "doc_id",
      expr("distinct_kgrams(ascii_tokens(text), 3)"), 50, 1L).collect()
    assert(got.isEmpty)
  }
}
