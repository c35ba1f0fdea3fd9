package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavioral specs for the curation-selection operators (CurationQueries)
  * — properties the oracle hash-compare cannot express: that the DSIR
  * selection tracks the discriminative signal, that RRF fusion ranks
  * two-list consensus above single-list presence, and that the embedding
  * outlier filter surfaces genuinely far-from-centroid vectors.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) = {
    graft.functions.TextFns.registerAll(spark)
    SparkEntry.queries(name)(spark, sfDir)
  }

  // ------------------------------------------------------------- o12

  test("o12_dsir_select: no target-source rows, bounded size, deterministic") {
    val rows = run("o12_dsir_select").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[String]("source") != "src0"),
      "a target-domain row leaked into the raw-side selection")
    val again = run("o12_dsir_select").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "selection is not deterministic across runs")
  }

  test("o12_dsir_select: scores track the exact per-token discriminative sign") {
    // The operator votes per HASH BUCKET; with vocab ≪ B=1024 collisions
    // are rare, so scores should rank-correlate strongly with the exact
    // (unhashed) per-token vote sum computed independently here. sf0.01,
    // not sf0.001: at 50 docs the target side holds ~3 docs and the
    // per-bucket counts are too sparse for a stable correlation floor.
    val corrDir = "/root/testdata/sf0.01"
    val docs = graft.Tables.load(spark, corrDir, "documents")
    val tf = docs.select(col("doc_id"), col("source"),
        explode(expr("tf_map(ascii_alpha_tokens(text, 3))")).as(Seq("term", "tfv")))
      .withColumn("tfv", col("tfv").cast("long"))
    val prof = tf.groupBy("term").agg(
      sum(when(col("source") === "src0", col("tfv")).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= "src0", col("tfv")).otherwise(0L)).as("cr"))
    val Array(totT, totR) = prof.agg(sum("ct"), sum("cr")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val votes = prof.select(col("term"),
      when(col("ct") * totR > col("cr") * totT, 1L).otherwise(-1L).as("vote"))
    val exact = tf.filter(col("source") =!= "src0")
      .join(votes, Seq("term"))
      .groupBy("doc_id").agg(sum(col("tfv") * col("vote")).as("exact_score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.functions.TextFns.registerAll(spark)
    val out = SparkEntry.queries("o12_dsir_select")(spark, corrDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Exact-signal top-100 (same tie-break as the operator). The corpus
    // vocabulary is ~30 terms, so a single md5 bucket collision merges
    // two terms' leanings and legitimately perturbs tied scores — the
    // floor measures that the SELECTED SET still substantially tracks
    // the unhashed signal (deterministic: fixed data, fixed hash).
    val exactTop = exact.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(out.size)
      .map(_._1).toSet
    val overlap = (out & exactTop).size
    assert(overlap >= (out.size * 6) / 10,
      s"bucketed selection overlaps exact-signal top-${out.size} in only " +
        s"$overlap docs")
  }

  // ------------------------------------------------------------- o13

  test("o13_moore_lewis: selection matches a double-math cross-entropy " +
      "difference ranking computed independently") {
    val corrDir = "/root/testdata/sf0.01"
    graft.functions.TextFns.registerAll(spark)
    val out = SparkEntry.queries("o13_moore_lewis")(spark, corrDir).collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(out.forall(_.getAs[String]("source") != "src0"),
      "a target-domain row leaked into the out-of-domain selection")
    // Independent double-math replica: per-token H_in − H_out with add-1
    // smoothed target LM; the quantized integer ranking may flip exact
    // boundary ties but must substantially agree on the selected SET.
    val docs = graft.Tables.load(spark, corrDir, "documents")
    val tf = docs.select(col("doc_id"), col("source"),
        explode(expr("tf_map(ascii_alpha_tokens(text, 3))")).as(Seq("term", "tfv")))
      .withColumn("tfv", col("tfv").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val cg = tf.groupBy(_._3).map { case (t, rs) => t -> rs.map(_._4).sum }
    val ct = tf.filter(_._2 == "src0").groupBy(_._3)
      .map { case (t, rs) => t -> rs.map(_._4).sum }
    val v = cg.size.toLong
    val totG = cg.values.sum.toDouble
    val totTs = (ct.values.sum + v).toDouble
    val scores = tf.filter(_._2 != "src0").groupBy(_._1).map { case (id, rs) =>
      val dl = rs.map(_._4).sum.toDouble
      val s = rs.map { case (_, _, t, n) =>
        n * (math.log(totTs / (ct.getOrElse(t, 0L) + 1.0))
          - math.log(totG / cg(t)))
      }.sum
      id -> s / dl
    }
    val exactTop = scores.toSeq.sortBy { case (id, s) => (s, id) }
      .take(out.length).map(_._1).toSet
    val got = out.map(_.getLong(0)).toSet
    val overlap = (got & exactTop).size
    assert(overlap >= (out.length * 9) / 10,
      s"quantized selection agrees with double-math top-${out.length} on " +
        s"only $overlap docs")
  }

  // ----------------------------------------------------------- t_rrf

  test("t_rrf_fusion: consensus docs outrank single-list docs, and the " +
      "fused score is exactly the sum of its rank contributions") {
    val rows = run("t_rrf_fusion")
      .select("doc_id", "rrf_fp", "bm_rank", "q_rank").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    def contrib(rank: Int): Long =
      if (rank > 0) 1000000000L / (60L + rank) else 0L
    for (r <- rows) {
      val (fp, bm, q) = (r.getLong(1), r.getInt(2), r.getInt(3))
      assert(fp == contrib(bm) + contrib(q),
        s"doc ${r.getLong(0)}: rrf_fp $fp != ${contrib(bm)} + ${contrib(q)}")
      assert(bm >= 0 && bm <= 20 && q >= 0 && q <= 20)
    }
    // list-truncated RRF property: both-lists min (2 × 1e9/80) beats
    // single-list max (1e9/61), so every consensus doc must score above
    // every single-list doc in the fused output.
    val both = rows.filter(r => r.getInt(2) > 0 && r.getInt(3) > 0)
    val single = rows.filter(r => (r.getInt(2) > 0) ^ (r.getInt(3) > 0))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(1)).min > single.map(_.getLong(1)).max,
        "a single-list doc outscored a consensus doc")
  }

  // ------------------------------------------------- pipe_curation_pass

  test("pipe_curation_pass: every packed doc passed the gate, per-lang " +
      "counts respect the quota, and tok_start is frame-consistent") {
    val corrDir = "/root/testdata/sf0.01"
    graft.functions.TextFns.registerAll(spark)
    val out = SparkEntry.queries("pipe_curation_pass")(spark, corrDir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.load(spark, corrDir, "documents")
    val keptIds = graft.operators.CorpusOps.gopherKeep(docs, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => keptIds.contains(r.getAs[Long]("doc_id"))),
      "a gate-failing doc reached the pack stage")
    // per-lang output counts must not exceed the sqrt-temperature quotas
    val byLang = out.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    val counts = graft.operators.CorpusOps.gopherKeep(docs, "text")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val roots = counts.view.mapValues(n => math.sqrt(n.toDouble).floor.toLong)
    val totR = roots.values.sum
    for ((lang, n) <- byLang) {
      val quota = 300L * roots(lang) / totR
      assert(n <= quota, s"lang $lang packed $n docs > quota $quota")
    }
    // packing invariant: within a lang, tok_start is the running sum of
    // the previous docs' n_tok (docs ordered by doc_id, zero-tok dropped)
    for ((_, rows) <- out.groupBy(_.getAs[String]("lang"))) {
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("tok_start") == cum,
          s"doc ${r.getAs[Long]("doc_id")} tok_start ${r.getAs[Long]("tok_start")} != cum $cum")
        cum += r.getAs[Long]("n_tok")
      }
    }
  }

  // ------------------------------------------------- emb_outlier_filter

  test("emb_outlier_filter: dense ranks, non-increasing scores, and the " +
      "top outlier is far from its label centroid in double math too") {
    val out = run("emb_outlier_filter")
      .select("label", "rank", "score", "vec_id").collect()
    assert(out.nonEmpty)
    val byLabel = out.groupBy(_.getInt(0))
    for ((l, rs) <- byLabel) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"label $l ranks not dense")
      val scores = sorted.map(_.getLong(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"label $l scores increase down the ranking")
    }
    // Independent double-math check: each label's rank-1 vector sits at
    // or above the label's 90th-percentile distance-to-mean (quantization
    // cannot demote a true extreme below the tail).
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byL = emb.groupBy(_._2)
    for ((l, rs) <- byLabel) {
      val vecs = byL(l)
      val dim = vecs.head._3.length
      val mean = Array.tabulate(dim)(j => vecs.map(_._3(j)).sum / vecs.length)
      def dist2(v: Array[Double]): Double =
        v.zip(mean).map { case (a, b) => (a - b) * (a - b) }.sum
      val dists = vecs.map(v => v._1 -> dist2(v._3)).toMap
      val top1 = rs.minBy(_.getInt(1)).getLong(3)
      val sortedD = dists.values.toSeq.sorted
      val p90 = sortedD((sortedD.size * 9) / 10 min (sortedD.size - 1))
      assert(dists(top1) >= p90,
        s"label $l rank-1 vec $top1 dist ${dists(top1)} below p90 $p90")
    }
  }
}
