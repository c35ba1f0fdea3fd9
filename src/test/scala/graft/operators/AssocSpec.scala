package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BfsOps against a brute-force Scala BFS on a dirty directed graph,
  * and the registered t_ks_drift / t_pmi_pairs queries against full
  * Scala reference implementations of the same integer arithmetic —
  * exact equality everywhere (the house fixed-point discipline means a
  * formula slip is an integer mismatch, never a tolerance smudge). */
class AssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------- BfsOps

  private def bruteBfs(
      edges: Seq[(Long, Long)], seeds: Set[Long], maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    var dist = seeds.filter(nodes).map(_ -> 0L).toMap
    for (h <- 1 to maxHops) {
      val frontier = dist.collect { case (n, d) if d == h - 1 => n }
      val reached = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
      dist = dist ++ reached.filterNot(dist.contains).map(_ -> h.toLong).toMap
    }
    nodes.map(n => n -> dist.getOrElse(n, -1L)).toMap
  }

  test("multiSourceBfs matches brute-force on a dirty directed graph") {
    import spark.implicits._
    // duplicates, a self-loop, a reverse edge, a disconnected component,
    // and a node (5) exactly one hop past the horizon.
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 3L), (3L, 4L),
      (4L, 5L), (2L, 1L), (10L, 11L))
    val seeds = Set(1L, 10L, 99L) // 99 is not a graph node: must not appear
    val got = BfsOps.multiSourceBfs(
        edges.toDF("s", "d"), "s", "d", seeds.toSeq.toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteBfs(edges, seeds, 3)
    assert(got == want)
    assert(got(5L) == -1L, "one hop past the horizon must be unreached")
    assert(!got.contains(99L), "a seed outside the graph is not a node")
  }

  test("multiSourceBfs directedness: no seed-reaching via reversed edges") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L)) // 3 points INTO 2; 2 cannot reach 3
    val got = BfsOps.multiSourceBfs(
        edges.toDF("s", "d"), "s", "d", Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> -1L))
  }

  test("multiSourceBfs frontier rounds settle long chains and diamond re-reaches") {
    import spark.implicits._
    // chain 1->2->3->4 plus a diamond shortcut 1->3: node 3 is reached
    // at hop 1 via the shortcut AND would be re-offered hop 2 via the
    // chain — the frontier filter must keep MIN semantics; node 4
    // settles at hop 2 through the shortcut.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    val got = BfsOps.multiSourceBfs(
        edges.toDF("s", "d"), "s", "d", Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    assert(got == bruteBfs(edges, Set(1L), 3))
    // sourcesSpanNodes on a mirrored version is value-identical
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val def_ = BfsOps.multiSourceBfs(
        sym.toDF("s", "d"), "s", "d", Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val span = BfsOps.multiSourceBfs(
        sym.toDF("s", "d"), "s", "d", Seq(1L).toDF("node"), maxHops = 3,
        sourcesSpanNodes = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(span == def_)
  }

  // ----------------------------------------------------- fixture helper

  /** Scratch dir holding ONLY documents.parquet with (doc_id, text,
    * lang, n_chars) rows. */
  private def docsDir(rows: Seq[(Long, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def lnFp(n: Long): Long =
    math.floor(1e6 * math.log(n.toDouble)).toLong

  // ---------------------------------------------------------- t_ks_drift

  test("t_ks_drift: identical length distributions give exactly 0 ppm") {
    val lens = Seq(10L, 20L, 20L, 30L, 50L)
    val rows = lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, "x", "en", l)
    } ++ lens.zipWithIndex.map { case (l, i) =>
      (100L + i, "x", "vi", l)
    }
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("n_en") == 5L && r.getAs[Long]("n_other") == 5L)
    assert(r.getAs[Long]("ks_d_ppm") == 0L,
      "identical distributions must be an exact integer zero, no tolerance")
  }

  test("t_ks_drift: disjoint supports give exactly 1e6 ppm at the crossover") {
    val rows = (0 until 4).map(i => (i.toLong, "x", "en", 10L + i)) ++
      (0 until 6).map(i => (50L + i, "x", "vi", 100L + i))
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("ks_d_ppm") == 1000000L)
    // max first attained once all of en has accumulated: at_chars = 13
    // (ties broken toward the smallest value)
    assert(r.getAs[Long]("at_chars") == 13L)
  }

  test("t_ks_drift matches a Scala reference on a mixed fixture") {
    val en = Seq(5L, 5L, 8L, 9L, 12L, 20L)
    val vi = Seq(5L, 9L, 9L, 14L, 20L, 20L, 33L)
    val rows = en.zipWithIndex.map { case (l, i) => (i.toLong, "x", "en", l) } ++
      vi.zipWithIndex.map { case (l, i) => (100L + i, "x", "vi", l) }
    val spine = (en ++ vi).distinct.sorted
    val d = spine.map { v =>
      val fp = en.count(_ <= v).toLong
      val fq = vi.count(_ <= v).toLong
      (math.abs(fp * vi.size - fq * en.size), v)
    }
    val (dnum, at) = d.maxBy { case (dn, v) => (dn, -v) }
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("at_chars") == at)
    assert(r.getAs[Long]("ks_d_ppm") ==
      dnum * 1000000L / (en.size.toLong * vi.size))
  }

  // --------------------------------------------------------- t_pmi_pairs

  /** Full Scala reference of the PMI query's integer arithmetic over
    * the same tokenization (maximal lowercase-alpha runs, length ≥ 3,
    * per-doc adjacency bigrams). */
  private def refPmi(texts: Seq[String], minSupport: Long, k: Int)
      : Seq[(String, String, Long, Long)] = {
    val toks = texts.map("[a-z]{3,}".r.findAllIn(_).toList)
    val bigrams = toks.flatMap(ts => ts.zip(ts.drop(1)))
    val c12 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n12 = c12.values.sum
    val n1 = uni.values.sum
    c12.toSeq.filter(_._2 >= minSupport)
      .map { case ((w1, w2), s) =>
        val pmi = lnFp(s) + 2 * lnFp(n1) - lnFp(n12) - lnFp(uni(w1)) - lnFp(uni(w2))
        (w1, w2, s, pmi)
      }
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(k)
  }

  test("t_pmi_pairs matches the Scala reference and ranks the collocation first") {
    // "foo bar" always adjacent (a true collocation); "the" is frequent
    // everywhere, so "the xxx" pairs have high support but low PMI; a
    // pair seen twice misses the support floor of 3.
    val docs = Seq(
      "foo bar sits near the window and the door",
      "the cat saw foo bar under the table",
      "foo bar and the dog ran past the gate",
      "rare pair rare pair the end",
      "the cat and the dog and the end")
    val rows = docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", t.length.toLong)
    }
    val got = graft.SparkEntry.queries("t_pmi_pairs")(spark, docsDir(rows))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("support"),
        r.getAs[Long]("pmi_fp"))).toSeq
    val want = refPmi(docs.map(_.toLowerCase), 3, 20)
    assert(got == want)
    assert(got.head._1 == "foo" && got.head._2 == "bar",
      "the always-adjacent pair must outrank frequent-word pairs")
    assert(!got.exists(p => p._1 == "rare" || p._2 == "rare"),
      "support floor must exclude the twice-seen pair")
  }

  // -------------------------------------------------------- g5_kcore_peel

  test("g5_kcore_peel matches iterated Scala peeling: core survives, chain peels") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    // Suppliers 1..3 × parts 1..3 complete bipartite block (degree 3
    // everywhere — survives k=3) plus a pendant chain supplier 9 - part
    // 9 (degree 1 — peels in round 1) and supplier 1 - part 9 (part 9's
    // removal drops nothing else: supplier 1 keeps degree 3).
    val li = (for { s <- 1L to 3L; p <- 1L to 3L } yield (s, p)) ++
      Seq((9L, 9L), (1L, 9L))
    li.toDF("l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("g5_kcore_peel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Scala reference: 3 peel rounds at k = 3 over mirrored edges.
    var edges = li.flatMap { case (s, p) =>
      Seq((2 * s + 1, 2 * p), (2 * p, 2 * s + 1)) }.distinct
    for (_ <- 1 to 3) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val want = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(got == want)
    assert(got.keySet == Set(3L, 5L, 7L, 2L, 4L, 6L),
      "exactly the 3x3 block survives")
    assert(!got.contains(18L) && !got.contains(19L), "the pendant chain peeled")
  }

  // --------------------------------------------------------- t_burstiness

  test("t_burstiness: a clumped term outranks an evenly spread one at equal mass") {
    // "clump": 7+1+1 across 3 docs (clears the df >= 3 floor, heavily
    // clumped); "spread": once in each of 9 docs. Equal total mass n = 9.
    val rows = (0 until 9).map { i =>
      val text = i match {
        case 0 => "clump " * 7 + "spread"
        case 1 | 2 => "clump spread"
        case _ => "spread filler"
      }
      (i.toLong, text, "en", 1L)
    }
    val got = graft.SparkEntry.queries("t_burstiness")(spark, docsDir(rows))
      .collect().map(r => (r.getString(0), r.getAs[Long]("df"),
        r.getAs[Long]("n"), r.getAs[Long]("vmr_ppm")))
    val byTerm = got.map(t => t._1 -> t).toMap
    // N = 9 docs. clump: df 3, n 9, s2 = 49+1+1 = 51 ->
    // vmr = (9*51 - 81)*1e6 / (9*9) = 378e6/81 = 4666666 (floor)
    assert(byTerm("clump") == (("clump", 3L, 9L, 4666666L)))
    // spread: df 9, n 9, s2 9 -> vmr = (81-81)*1e6/81 = 0
    assert(byTerm("spread") == (("spread", 9L, 9L, 0L)))
    assert(got.head._1 == "clump", "clumped term must rank first")
  }

  // ----------------------------------------------------- t_tfidf_keywords

  test("t_tfidf_keywords: ubiquitous terms score zero; rare terms lead") {
    val rows = Seq(
      (0L, "everywhere quantum quantum flux", "en", 1L),
      (1L, "everywhere lattice", "en", 1L),
      (2L, "everywhere vortex", "en", 1L))
    val got = graft.SparkEntry.queries("t_tfidf_keywords")(spark, docsDir(rows))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getAs[Long]("score_fp")))
    val doc0 = got.filter(_._1 == 0L)
    // df(everywhere) = 3 = N -> idf_fp = 0 -> score 0, ranked last of 3.
    assert(doc0.map(_._3).toSeq == Seq("quantum", "flux", "everywhere"))
    val idfRare = lnFp(3) - lnFp(1)
    assert(doc0.head._4 == 2 * idfRare, "tf=2 times idf of a df=1 term")
    assert(doc0.last._4 == 0L, "df = N term must score exactly zero")
  }

  // -------------------------------------------------------------- a22_hhi

  test("a22_hhi: single source is exactly 1e6; uniform 4-way split is 250000") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    val rows = (0 until 8).map(i => (i.toLong, "x", "en", "only", 1L)) ++
      (0 until 12).map(i => (100L + i, "x", "vi", s"s${i % 4}", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("a22_hhi")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("en") == ((8L, 1L, 1000000L)))
    assert(got("vi") == ((12L, 4L, 250000L)))
  }

  // ------------------------------------------------------- w14_debounce

  test("w14_debounce: bursts collapse to their first event; spaced events all keep") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: burst of 4 within 3 minutes, then one 2h later -> keep 2.
    // user 2: 3 events exactly 1h apart -> boundary (gap == threshold) keeps.
    val rows = Seq(
      (1L, 1L, ts(10, 0)), (2L, 1L, ts(10, 1)), (3L, 1L, ts(10, 2)),
      (4L, 1L, ts(10, 3)), (5L, 1L, ts(12, 10)),
      (10L, 2L, ts(8, 0)), (11L, 2L, ts(9, 0)), (12L, 2L, ts(10, 0)))
    rows.map { case (e, u, t) => (e, t, u, "a", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("w14_debounce")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((5L, 2L)), "burst collapses to first + the spaced event")
    assert(got(2L) == ((3L, 3L)), "gap exactly at the threshold keeps (>=)")
  }

  // --------------------------------------------------- t_ngram_novelty

  test("t_ngram_novelty: first doc fully novel, exact dup fully stale, overlap exact") {
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "alpha beta gamma delta epsilon zeta" // dup of doc 0
    // doc 2 shares its first 3-gram window with doc 0, rest fresh:
    val c = "alpha beta gamma omega sigma tau"
    val rows = Seq((0L, a, "en", 1L), (1L, b, "en", 1L), (2L, c, "en", 1L))
    val got = graft.SparkEntry.queries("t_ngram_novelty")(spark, docsDir(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == ((4L, 4L, 1000000L)), "doc 0: all 4 shingles novel")
    assert(got(1L) == ((4L, 0L, 0L)), "exact dup: nothing novel")
    // doc 2 shingles: 'alpha beta gamma' (seen), then 3 fresh
    assert(got(2L) == ((4L, 3L, 750000L)))
  }

  // -------------------------------------------------- g7_link_predict

  test("g7_link_predict: rare shared parts outrank common ones; exact AA weights") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    // parts: 500 shared by suppliers {1,2} only (deg 2, rare);
    // 600 shared by {3,4} and also stocked by 5..8 (deg 6, common);
    // 700 stocked by ALL suppliers 1..70 (deg 70 > cap 64: excluded).
    val li = Seq((1L, 500L), (2L, 500L)) ++
      Seq(3L, 4L, 5L, 6L, 7L, 8L).map(s => (s, 600L)) ++
      (1L to 70L).map(s => (s, 700L))
    li.toDF("l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("g7_link_predict")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    def w(d: Long) = 1000000000000L / lnFp(d)
    assert(got((1L, 2L)) == ((1L, w(2))), "rare pair weight = 1e12/lnq(2)")
    assert(got((3L, 4L)) == ((1L, w(6))))
    assert(w(2) > w(6), "rarer common part must weigh more")
    assert(!got.keySet.exists { case (x, y) => x >= 9L || y > 8L && y != 2L },
      "the capped deg-70 part must generate no pairs")
  }
}
