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

  test("weighted sample matches the w/u priority reference and is PPS-biased") {
    import spark.implicits._
    val m = 999999937L
    def hash(v: Long) = ((v % m + m) * 123456791L + 7919L) % m
    val rnd = new scala.util.Random(3)
    val rows = (1L to 200L).map(i =>
      (i, "t", if (i == 7L) 1000000L else rnd.nextInt(500).toLong + 1L))
    val dir = Files.createTempDirectory("graft_o15").toString
    rows.map { case (id, t, n) => (id, t, n, "s" + (id % 2)) }
      .toDF("doc_id", "text", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("o15_weighted_sample")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // reference: top-5 per source by (w*M)/(h+1) desc, doc_id asc
    val ref = rows.map { case (id, _, n) => ("s" + (id % 2), id, n * m / (hash(id) + 1)) }
      .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        ds.sortBy(d => (-d._3, d._2)).take(5).zipWithIndex
          .map { case ((_, id, pri), i) => (src, i + 1, pri, id) }
      }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == ref)
    // PPS bias observed: the mega-weight doc is sampled (it can still be
    // OUTRANKED by a doc that drew a tiny u — w/u is heavy-tailed, and
    // this fixture contains such a draw (doc 81, h=8620) — but a 2000x
    // weight advantage cannot miss the top five of a 100-doc shard).
    assert(got.exists(_._4 == 7L))
  }

  test("funnel depth matches a per-user subsequence reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (1L to 600L).map { i =>
      (i, new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        (i % 40) + 1L, types(rnd.nextInt(types.size)))
    }
    val dir = Files.createTempDirectory("graft_w11").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("w11_funnel_depth")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // reference: ordered subsequence scan per user
    val ref = rows.groupBy(_._3).values.map { es =>
      val seq = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
      var depth = 0
      for (t <- seq) depth match {
        case 0 => if (t == "view") depth = 1
        case 1 => if (t == "click") depth = 2
        case 2 => if (t == "purchase") depth = 3
        case _ =>
      }
      depth
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == ref, s"got $got vs ref $ref")
    assert(got.values.sum == 40L)
  }

  test("bigram NLL is word-order sensitive where unigram NLL is blind") {
    // 20 docs of the same natural sentence + 1 doc with the SAME words
    // shuffled: identical bags -> identical unigram scores; broken
    // collocations -> the shuffled doc must score strictly higher per
    // bigram. This is the signal the bigram escalation exists for.
    val sentence = "the quick brown fox jumps over the lazy dog and " +
      "the calm white cat naps under the warm red roof"
    val shuffled = new scala.util.Random(5)
      .shuffle(sentence.split(" ").toSeq).mkString(" ")
    val docs = (1L to 20L).map(i => (i, sentence, 1L)) :+ ((21L, shuffled, 1L))
    val dir = docsDir(docs)
    def perUnit(q: String, idx: Int): Map[Long, Long] =
      graft.SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(idx)).toMap
    val bg = perUnit("t_bigram_nll", 3) // nll_per_bg_fp
    assert(bg(21L) > bg(1L),
      s"shuffled doc should score worse under bigrams: ${bg(21L)} vs ${bg(1L)}")
    val uni = graft.SparkEntry.queries("t_unigram_nll")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // nll_per_tok_fp
    assert(uni(21L) == uni(1L), "unigram must be order-blind on equal bags")
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

  test("entropy: uniform doc scores exactly ln(dl), degenerate doc exactly 0") {
    // doc 1: 16 DISTINCT words (every tf = 1, lnq(1) = 0) -> entropy_ppm
    // is exactly floor(1e6*ln 16). doc 2: one word 16 times -> the
    // identity collapses to lnq(16) - (16*lnq(16)) div 16 = 0 exactly.
    val distinct16 = (0 until 16)
      .map(i => s"word${('a' + i).toChar}${('a' + i).toChar}").mkString(" ")
    val same16 = Seq.fill(16)("wordzz").mkString(" ")
    val dir = docsDir(Seq((1L, distinct16, 1L), (2L, same16, 1L)))
    val out = graft.SparkEntry.queries("t_entropy")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ln16 = math.floor(1e6 * math.log(16.0)).toLong
    assert(out(1L) == ((16L, ln16)))
    assert(out(2L) == ((16L, 0L)))
  }

  /** Scratch documents table WITH a lang column (the KL slice key). */
  private def docsDirLang(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_metrics").toString
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("KL drift: identical slices diverge exactly 0; a skewed slice is positive both ways") {
    val base = "alpha beta gamma delta epsilon zeta " * 10
    val same = docsDirLang(Seq((1L, base, "en"), (2L, base, "fr")))
    val r0 = graft.SparkEntry.queries("t_kl_drift")(spark, same).collect()(0)
    // ca == cb for every term AND na == nb -> both sums and both log
    // corrections cancel EXACTLY (integer identity, not a tolerance).
    assert(r0.getAs[Long]("kl_ab_ppm") == 0L)
    assert(r0.getAs[Long]("kl_ba_ppm") == 0L)
    val skewed = docsDirLang(Seq(
      (1L, base + (" omega" * 40), "en"), (2L, base, "fr")))
    val r1 = graft.SparkEntry.queries("t_kl_drift")(spark, skewed).collect()(0)
    assert(r1.getAs[Long]("kl_ab_ppm") > 0L, "drifted slice must diverge")
    assert(r1.getAs[Long]("kl_ba_ppm") > 0L, "smoothed KL is positive both ways")
  }

  /** Scratch dir with a parts table (the fuzzy-key fixture). */
  private def partsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_metrics").toString
    rows.toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("fuzzy key matching: typos pair inside a block, exact dupes and cross-block typos don't") {
    val dir = partsDir(Seq(
      (1L, "red widget"), (2L, "red widget"),     // exact dupes: dist 0, excluded
      (3L, "red wdget"), (4L, "red widgget"),     // typos of 1: must pair with it
      (5L, "rad widget"),                          // first-token typo: blocked away
      (6L, "red sprocket")))                       // same block, dist > 3: no pair
    val got = graft.SparkEntry.queries("dedup_fuzzy_key")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      ("red wdget", "red widgget", 2),  // both are edits of the same value
      ("red wdget", "red widget", 1),
      ("red widget", "red widgget", 1)))
    // rows_a/rows_b carry the per-VALUE row counts (value-space design)
    val rows = graft.SparkEntry.queries("dedup_fuzzy_key")(spark, dir).collect()
      .find(r => r.getString(1) == "red widget").get
    assert(rows.getLong(4) == 2L, "duplicate rows fold into one value row")
  }

  /** Scratch documents dir with lang AND n_chars (the PSI fixture). */
  private def docsDirLangChars(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_metrics").toString
    rows.map { case (id, lang, nc) => (id, "t", lang, nc) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("PSI drift: identical length distributions give exactly 0; a shift is large and positive") {
    val lens = (1L to 50L).map(_ * 7 % 100 + 10)
    val same = docsDirLangChars(
      lens.zipWithIndex.flatMap { case (n, i) =>
        Seq((i * 2L, "en", n), (i * 2L + 1, "fr", n)) })
    val r0 = graft.SparkEntry.queries("t_psi_drift")(spark, same).collect()(0)
    assert(r0.getAs[Long]("psi_ppm") == 0L) // ca=cb per bucket, na=nb: exact
    val shifted = docsDirLangChars(
      lens.zipWithIndex.flatMap { case (n, i) =>
        Seq((i * 2L, "en", n), (i * 2L + 1, "fr", n + 60)) })
    val r1 = graft.SparkEntry.queries("t_psi_drift")(spark, shifted).collect()(0)
    assert(r1.getAs[Long]("psi_ppm") > 200000L,
      s"a 60-char shift must read as major drift, got ${r1.getAs[Long]("psi_ppm")}")
  }

  test("Heaps slope: all-fresh vocabulary fits exactly 1e6 ppm, a fixed vocabulary exactly 0") {
    // A: every doc introduces 10 corpus-unique words -> V(n) = n at
    // every curve point -> y = x -> the integer LS slope is EXACTLY 1e6.
    // pure-alpha words (the tokenizer treats digits as separators)
    val fresh = (1L to 128L).map(d =>
      (d, (0 until 10).map(i =>
        s"w${('a' + d / 26).toChar}${('a' + d % 26).toChar}q${('a' + i).toChar}")
        .mkString(" "), 1L))
    val a = graft.SparkEntry.queries("t_heaps_slope")(spark, docsDir(fresh))
      .collect()(0)
    assert(a.getLong(1) == 1000000L, s"fresh-vocab beta: ${a.getLong(1)}")
    // B: one shared 10-word vocabulary -> cumulative vocab is constant,
    // so the slope is exactly 0 (y constant while x grows).
    val fixed = (1L to 128L).map(d =>
      (d, (0 until 10).map(i => s"commonword${('a' + i).toChar}").mkString(" "), 1L))
    val b = graft.SparkEntry.queries("t_heaps_slope")(spark, docsDir(fixed))
      .collect()(0)
    assert(b.getLong(1) == 0L, s"fixed-vocab beta: ${b.getLong(1)}")
  }

  /** Scratch dir with a lineitem table (the basket fixture). */
  private def basketDir(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_metrics").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("frequent pairs: exact support and lift on a constructed basket set") {
    // 10 orders: parts (1,2) together in 6, (1,3) in 2, part 4 alone in 2.
    val rows = (1L to 6L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      (7L to 8L).flatMap(o => Seq((o, 1L), (o, 3L))) ++
      (9L to 10L).map(o => (o, 4L))
    val got = graft.SparkEntry.queries("a19_frequent_pairs")(spark, basketDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // support(1,2)=6, lift = 6*10/(8*6) = 1.25 -> 1_250_000 ppm;
    // support(1,3)=2, lift = 2*10/(8*2) = 1.25 -> 1_250_000 ppm.
    assert(got.toSeq == Seq((1L, 2L, 6L, 1250000L), (1L, 3L, 2L, 1250000L)))
  }

  test("decile profile: closed-form buckets split 1..20 into exact pairs") {
    val docs = (1L to 20L).map(i => (i, "t", i))
    val dir = docsDir(docs)
    val out = graft.SparkEntry.queries("o16_decile")(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == (1 to 10).toSet)
    for (d <- 1 to 10)
      assert(out(d) == ((2L, 2L * d - 1, 2L * d)),
        s"decile $d: ${out(d)}")
  }
}
