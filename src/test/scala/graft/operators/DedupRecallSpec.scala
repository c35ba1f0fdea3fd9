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

  // ---- containmentRecall (r15, directive 5): the df-capped
  // containment generator gets the same measured-recall treatment as
  // minhash/simhash. Grams are passed directly (array_distinct over a
  // whitespace split) so the pins exercise the operator, not the
  // tokenizer.

  private def contRecallRow(
      rows: Seq[(Long, String)], dfCap: Int, probe: Long):
      (Long, Long, Option[Long]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = rows.toDF("doc_id", "text")
    val r = DedupOps.containmentRecall(df, "doc_id",
        array_distinct(split(col("text"), " ")),
        dfCap, minContainPpm = 600000L, probeBound = probe)
      .collect()
    assert(r.length == 1 && r.head.getString(0) == "containment_dfcap")
    (r.head.getLong(1), r.head.getLong(2),
      if (r.head.isNullAt(3)) None else Some(r.head.getLong(3)))
  }

  test("containmentRecall: a planted subset pair (low Jaccard, full " +
      "containment) enters truth and the df-capped generator recovers it") {
    // doc 0 = 10 'a' tokens, doc 1 = those 10 + 30 'b' tokens: Jaccard
    // 10/40 = 0.25 but containment 10/10 = 1.0; doc 2 shares only 5 of
    // doc 0's tokens (500000 ppm < the 600000 gate — stays OUT of
    // truth); docs 3..9 have disjoint vocabularies.
    val rows =
      Seq(0L -> (0 until 10).map(k => s"a$k").mkString(" "),
        1L -> ((0 until 10).map(k => s"a$k") ++
          (0 until 30).map(k => s"b$k")).mkString(" "),
        2L -> ((0 until 5).map(k => s"a$k") ++
          (0 until 15).map(k => s"e$k")).mkString(" ")) ++
      (3L until 10L).map(i =>
        i -> (0 until 20).map(k => s"d${i}x$k").mkString(" "))
    val (nTruth, nHits, bp) = contRecallRow(rows, dfCap = 50, probe = 1000L)
    assert(nTruth == 1L, s"only the planted subset pair is truth: $nTruth")
    assert(nHits == 1L && bp.contains(10000L),
      s"df-capped generator must recover it here: hits=$nHits bp=$bp")
  }

  test("containmentRecall: pairs held together ONLY by high-df grams are " +
      "counted as truth but missed once the cap drops those grams — the " +
      "audit reports the cap's real recall cost") {
    // docs 0 and 1 are exactly the 10 common tokens; 30 filler docs
    // carry all 10 commons (df = 32 > cap 10) plus 40 uniques each.
    // Truth with probe bound 2: (0,1) plus 0/1 contained in every
    // filler = 61 pairs; the capped generator keeps NO grams for docs
    // 0 and 1, so it finds none of them.
    val common = (0 until 10).map(k => s"c$k")
    val rows = Seq(0L -> common.mkString(" "), 1L -> common.mkString(" ")) ++
      (2L until 32L).map(i => i ->
        (common ++ (0 until 40).map(k => s"u${i}x$k")).mkString(" "))
    val (nTruth, nHits, bp) = contRecallRow(rows, dfCap = 10, probe = 2L)
    assert(nTruth == 61L, s"truth pairs with lower id < 2: $nTruth")
    assert(nHits == 0L && bp.contains(0L),
      s"cap must drop every shared gram here: hits=$nHits bp=$bp")
  }

  test("containmentRecall: empty probe slice reports null recall") {
    val rows = (0L until 5L).map(i =>
      i -> (0 until 10).map(k => s"d${i}x$k").mkString(" "))
    val (nTruth, nHits, bp) = contRecallRow(rows, dfCap = 10, probe = 0L)
    assert(nTruth == 0L && nHits == 0L && bp.isEmpty,
      s"no probe docs -> no truth, null bp: $nTruth $nHits $bp")
  }
}
