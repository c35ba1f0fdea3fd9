package graft.tools

import graft.Checkpoints.CheckpointSyntax
import graft.{Sessions, Tables}
import graft.operators.{DedupOps, GraphOps}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 optimization-round probe: same-JVM alternating A/B for
  *
  *  1. connectedComponents' redundant re-canonicalization on
  *     already-canonical LSH pair inputs (dedup_cc_clusters shape):
  *     `assumeCanonical=true` drops one |pairs| distinct shuffle and one
  *     |pairs| checkpoint materialization per cc call.
  *  2. g8_modularity: (a) labelPropagation re-canonicalizing the
  *     caller-checkpointed edge set (same fix), and (b) sharing ONE
  *     edge×label join for both the intra-edge classification and the
  *     community degree mass (the per-node degree aggregate + its label
  *     join disappear; nodes-per-community comes off the label table).
  *
  * Parity is checksummed (ProbeHarness.sig) before any timing counts.
  * Usage: runMain graft.tools.ProfileR15 <sfDir> <reps>
  */
object ProfileR15 {

  // --- shared fixtures (replicate the query bodies; queries themselves
  // are untouched until a variant wins) -------------------------------

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanOut(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 200).as("t"))
    val planted = d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("lang"),
        concat(col("t"), lit(" near dup tail")).as("t"))
    d.unionByName(planted)
  }

  private def coEdges(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val a = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
    val b = op.select(col("o"), col("p").as("p2"))
    a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
  }

  // --- variant bodies -------------------------------------------------

  private def ccClusters(s: SparkSession, dir: String,
      canonical: Boolean): DataFrame = {
    val pairs = DedupOps.minHashLshPairs(corpus(s, dir), "doc_id", "t",
      shingleK = 3, numHashes = 8, bands = 2)
    GraphOps.connectedComponents(pairs, "id_a", "id_b",
        assumeCanonical = canonical)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"),
        (col("node") === col("component")).as("is_survivor"))
      .orderBy("doc_id")
  }

  private def g8Current(s: SparkSession, dir: String): DataFrame = {
    val e = coEdges(s, dir).distinct().checkpointed()
    val labels = GraphOps.labelPropagation(e, "p1", "p2", rounds = 2)
      .checkpointed()
    val m = e.count()
    val dec = s"CAST($m AS DECIMAL(38,0))"
    val intra = e
      .join(labels.select(col("v").as("p1"), col("label").as("la")), Seq("p1"))
      .join(labels.select(col("v").as("p2"), col("label").as("lb")), Seq("p2"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("m_intra"))
    val deg = e.select(col("p1").as("v")).union(e.select(col("p2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val degC = deg.join(labels, Seq("v"))
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("deg_sum"))
    val per = degC.join(intra, Seq("community"), "left")
      .withColumn("m_intra", coalesce(col("m_intra"), lit(0L)))
      .withColumn("num", expr(
        s"4 * $dec * m_intra - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum"))
    val qTot = per.agg(expr(
      s"CAST(sum(num) * 1000000 div (4 * $dec * $m) AS BIGINT)")
      .as("q_total_ppm"))
    per.crossJoin(broadcast(qTot))
      .select(col("community"), col("n_nodes"), col("m_intra"), col("deg_sum"),
        expr(s"CAST(num * 1000000 div (4 * $dec * $m) AS BIGINT)")
          .as("contrib_ppm"),
        col("q_total_ppm"))
      .orderBy("community")
  }

  /** assumeCanonical LPA + one shared edge×label pass for intra AND
    * degree mass + a checkpointed tiny per-community table so the qTot
    * fold does not re-execute the join subtree. */
  private def g8Shared(s: SparkSession, dir: String): DataFrame = {
    val e = coEdges(s, dir).distinct().checkpointed()
    val labels = GraphOps.labelPropagation(e, "p1", "p2", rounds = 2,
        assumeCanonical = true)
      .checkpointed()
    val m = e.count()
    val dec = s"CAST($m AS DECIMAL(38,0))"
    val el = e
      .join(labels.select(col("v").as("p1"), col("label").as("la")), Seq("p1"))
      .join(labels.select(col("v").as("p2"), col("label").as("lb")), Seq("p2"))
      .select("la", "lb")
      .checkpointed()
    val intra = el.filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("m_intra"))
    val degC = el.select(col("la").as("community"))
      .union(el.select(col("lb").as("community")))
      .groupBy("community").agg(count(lit(1)).as("deg_sum"))
    val nNodes = labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val per = nNodes.join(degC, Seq("community"))
      .join(intra, Seq("community"), "left")
      .withColumn("m_intra", coalesce(col("m_intra"), lit(0L)))
      .withColumn("num", expr(
        s"4 * $dec * m_intra - CAST(deg_sum AS DECIMAL(38,0)) * deg_sum"))
      .checkpointed()
    val qTot = per.agg(expr(
      s"CAST(sum(num) * 1000000 div (4 * $dec * $m) AS BIGINT)")
      .as("q_total_ppm"))
    per.crossJoin(broadcast(qTot))
      .select(col("community"), col("n_nodes"), col("m_intra"), col("deg_sum"),
        expr(s"CAST(num * 1000000 div (4 * $dec * $m) AS BIGINT)")
          .as("contrib_ppm"),
        col("q_total_ppm"))
      .orderBy("community")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    val h = new ProbeHarness(spark, "r15")

    // parity first — a faster wrong answer must not win
    val ccBase = h.sig(ccClusters(spark, sfDir, canonical = false))
    h.parity(ccBase, Seq(
      "cc_canonical" -> (() => ccClusters(spark, sfDir, canonical = true))))
    val g8Base = h.sig(g8Current(spark, sfDir))
    h.parity(g8Base, Seq("g8_shared" -> (() => g8Shared(spark, sfDir))))

    // alternating, GC-separated reps
    for (r <- 1 to reps) {
      h.time(s"cc_current#$r")(ccClusters(spark, sfDir, canonical = false))
      h.time(s"cc_canonical#$r")(ccClusters(spark, sfDir, canonical = true))
    }
    for (r <- 1 to reps) {
      h.time(s"g8_current#$r")(g8Current(spark, sfDir))
      h.time(s"g8_shared#$r")(g8Shared(spark, sfDir))
    }
    spark.stop()
  }
}
