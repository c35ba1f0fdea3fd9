package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.CheckpointSyntax
import graft.operators.DedupOps

/** r13 VERDICT item 6: dedup_lsh_recall is the only query flagged
  * degraded+retried in BOTH the r12 and r13 driver runs, with the
  * in-suite < isolated inversion (3.76 vs 4.33 s) that marks
  * cache-residency/contention sensitivity. The r14 JobCensus shows
  * three ~5250-record kernel stages of 16.9 / 16.4 / 11.4 s task-time
  * (minhash lanes, the checkpointed truth cross-join, simhash) — the
  * corpus fingerprint work runs once per branch. This probe measures,
  * same-JVM alternating reps:
  *   current — the registered form (truth checkpointed, branches
  *             re-derive from the corpus subtree);
  *   ck_corpus — corpus localCheckpointed first, branches read the
  *             materialized rows (isolates scan-subtree contention);
  *   ck_tokens — ascii_tokens materialized ONCE in a checkpoint and
  *             shared by the truth shingles and the minhash lanes
  *             (simhash stays text-kernel: different tokenization).
  * Usage: `sbt "runMain graft.tools.ProfileLshRecall [sfDir] [reps]"`.
  */
object ProfileLshRecall {

  private val recallProbe = 50

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.fanOut(graft.Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 200).as("t"))
    val planted = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("lang"),
        concat(col("t"), lit(" near dup tail")).as("t"))
    d.unionByName(planted)
  }

  /** The registered query's shape, parameterized by how the corpus and
    * token subtrees are shared. shareTokens additionally routes the
    * simhash branch through the SAME checkpointed frame (its `t`
    * column), so no branch reads the raw scan subtree at all. */
  private def recall(c: DataFrame, shareTokens: Boolean): DataFrame = {
    val (tok, mh, shSrc) =
      if (shareTokens) {
        val ct = c.select(col("doc_id"), col("t"),
          expr("ascii_tokens(t)").as("w")).checkpointed()
        (ct.select(col("doc_id"), expr("distinct_kgrams(w, 3)").as("toks")),
          DedupOps.minHashLshPairsFromTokens(ct, "doc_id", "w",
              shingleK = 3, numHashes = 8, bands = 2)
            .filter(col("id_a") < recallProbe).select("id_a", "id_b"),
          ct)
      } else
        (c.select(col("doc_id"),
          expr("distinct_kgrams(ascii_tokens(t), 3)").as("toks")),
          DedupOps.minHashLshPairs(c, "doc_id", "t",
              shingleK = 3, numHashes = 8, bands = 2)
            .filter(col("id_a") < recallProbe).select("id_a", "id_b"),
          c)
    val probe = tok.filter(col("doc_id") < recallProbe)
      .select(col("doc_id").as("id_a"), col("toks").as("ta"))
    val truth = tok.select(col("doc_id").as("id_b"), col("toks").as("tb"))
      .crossJoin(broadcast(probe))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(expr("array_intersect(ta, tb)")))
      .filter(expr(
        "CAST(inter AS DOUBLE) / CAST(size(ta) + size(tb) - inter AS DOUBLE) >= 0.6"))
      .select("id_a", "id_b")
      .checkpointed()
    val sh = DedupOps.simHashPairs(shSrc, "doc_id", "t",
        bits = 16, prefixBits = 8, maxHamming = 3)
      .filter(col("id_a") < recallProbe).select("id_a", "id_b")
    def row(method: String, cand: DataFrame) =
      truth.agg(count(lit(1)).as("n_truth")).crossJoin(
          truth.join(cand, Seq("id_a", "id_b"), "left_semi")
            .agg(count(lit(1)).as("n_hits")))
        .select(lit(method).as("method"), col("n_truth"), col("n_hits"),
          expr("CASE WHEN n_truth > 0 THEN (n_hits * 10000) div n_truth END")
            .as("recall_bp"))
    row("minhash_lsh", mh).unionByName(row("simhash", sh)).orderBy("method")
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val h = new ProbeHarness(spark, "lshr")

    def cur() = recall(corpus(spark, sf), shareTokens = false)
    def ckC() = recall(corpus(spark, sf).checkpointed(), shareTokens = false)
    def ckT() = recall(corpus(spark, sf), shareTokens = true)

    val base = h.sig(cur())
    h.parity(base, Seq("ck_corpus" -> (() => ckC()),
      "ck_tokens" -> (() => ckT())))

    for (r <- 1 to reps) {
      h.time(s"current#$r")(cur())
      h.time(s"ck_corpus#$r")(ckC())
      h.time(s"ck_tokens#$r")(ckT())
    }
    spark.stop()
  }
}
