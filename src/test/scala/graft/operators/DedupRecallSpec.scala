package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** dedup_lsh_recall behavioral pins on a constructed corpus: the
  * planted near-dup pairs ARE the shingle-Jaccard truth, MinHash
  * banding must recover all of them (8 hashes / 2 bands at J ~ 0.9
  * has candidate probability 1 − (1 − J⁴)² ≈ 0.95 per pair — and the
  * planted construction is deterministic, so the measured recall is a
  * REPLAYABLE number, not a flaky expectation: this corpus measures
  * 10000 bp), and an unrelated doc pair must stay out of truth. */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted near-dups form the truth set; minhash recovers them on this corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_recall").toString
    // 30 docs with distinct content-heavy text; doc_id % 20 == 0 gets a
    // planted near-dup at +100000 (the corpus() construction).
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rows = (0L until 30L).map { i =>
      val body = (0 until 24).map(k => words(((i * 7 + k * 5) % 12).toInt))
        .mkString(" ")
      (i, body, "en", body.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_lsh_recall")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nTruth, nHits, bp) = got("minhash_lsh")
    // planted dups exist for doc ids 0 and 20 (both < probe 50)
    assert(nTruth >= 2L, s"planted pairs must enter the truth set, got $nTruth")
    assert(nHits == nTruth && bp == 10000L,
      s"minhash must recover every planted pair on this corpus: $got")
    assert(got("simhash")._1 == nTruth, "both methods measure the same truth")
  }

  test("dedup_threshold_curve: all thresholds reported, counts monotone " +
      "non-increasing in tau, planted near-dups caught at the low end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_curve").toString
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rows = (0L until 30L).map { i =>
      val body = (0 until 24).map(k => words(((i * 7 + k * 5) % 12).toInt))
        .mkString(" ")
      (i, body, "en", body.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_threshold_curve")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(50, 60, 70, 80, 90),
      "every threshold must appear exactly once, ordered")
    val pairs = got.map(_._2._1)
    val dropped = got.map(_._2._2)
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"pair count must not rise with tau: ${pairs.mkString(",")}")
    assert(dropped.zip(dropped.tail).forall { case (a, b) => a >= b },
      s"dropped-doc count must not rise with tau: ${dropped.mkString(",")}")
    assert(got.forall { case (_, (p, d)) => d <= p },
      "a dropped doc implies at least one surviving pair")
    // the planted +100000 near-dups sit at J ~ 0.9+: present at tau=50
    assert(got.head._2._1 >= 2, s"planted near-dups missed: ${got.toSeq}")
  }

  test("dedup_incremental: base copies flag dup_of_base with the base " +
      "keeper; fresh variants are new once and dup_in_increment after") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_incr").toString
    val rows = (0L until 30L).map(i => (i, s"doc body $i", "en", 10L))
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // increment = ids 0,10,20 copied (+200000), ids 5,15,25 fresh
    // (+300000) and their second copies (+400000)
    assert(got.size == 9, s"increment size: ${got.keys.toSeq.sorted}")
    for (i <- Seq(0L, 10L, 20L))
      assert(got(i + 200000) == (("dup_of_base", i)), s"id $i: ${got(i + 200000)}")
    for (i <- Seq(5L, 15L, 25L)) {
      assert(got(i + 300000) == (("new", -1L)), s"id $i: ${got(i + 300000)}")
      assert(got(i + 400000) == (("dup_in_increment", i + 300000)),
        s"id $i: ${got(i + 400000)}")
    }
  }

  test("dedup_near_incremental: planted tails classify against their base " +
      "source; fresh-vocabulary docs stay new") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_nearincr").toString
    // DISJOINT per-doc vocabulary (tok<i>x<k>), so cross-doc token-set
    // Jaccard is ~0 and only a doc's own tail can verify against it —
    // the classification is decided by the verify step, not by which
    // band buckets happen to collide
    // PURE-ALPHA distinct tokens (digits encode as letters): the verify
    // step tokenizes with [a-z]+, so a digit-bearing vocabulary would
    // collapse every doc to the same tiny token set and reject
    // correctly-banded pairs. ~24 distinct tokens survive the 200-char
    // cap; the 3-token tail leaves J ≈ 24/27 — far above the 0.5 gate,
    // and band recall at 4x2 is recovered on this corpus (measured,
    // the dedup_lsh_recall pinning convention).
    def alpha(n: Long): String = n.toString.map(c => ('a' + (c - '0')).toChar)
    val rows = (0L until 40L).map { i =>
      val body = (0 until 100).map(k => s"q${alpha(i)}x${alpha(k)}").mkString(" ")
      (i, body, "en", body.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_near_incremental")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // inc = tails of ids 0, 20 (+100000) and fresh docs for ids 7, 27
    assert(got.size == 4, s"increment: ${got.keys.toSeq.sorted}")
    for (i <- Seq(0L, 20L))
      assert(got(i + 100000) == (("near_dup_of_base", i)),
        s"tail of $i: ${got(i + 100000)}")
    for (i <- Seq(7L, 27L))
      assert(got(i + 500000) == (("new", -1L)), s"fresh $i: ${got(i + 500000)}")
  }
}
