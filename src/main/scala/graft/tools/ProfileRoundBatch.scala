package graft.tools

import org.apache.spark.sql.{DataFrame, GraftBenchShim}
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry, Tables}
import graft.Checkpoints.CheckpointSyntax

/** Dev probe (r13): same-JVM A/B of ROUND-BATCHING the eager lineage
  * cuts in the iterative family (r12 VERDICT item 1 — the drift
  * postmortem proved wall time ≈ job count × the host's driver-side
  * planning floor, so fewer materialization barriers should win both
  * locally and at cluster scale).
  *
  * The PRODUCTION baselines come from the registry (root sort stripped,
  * as Bench does), so the probe cannot silently drift from the shipped
  * plans; only the REJECTED/historical shapes are re-implemented
  * inline. Verdicts recorded in-code after the r13 run:
  *   g5  — cutting the final peel round lost (its only consumer reads
  *         it once); the registered query now cuts between rounds only.
  *         Batching 2 rounds per cut measured neutral. See
  *         AssocQueries g5.
  *   g9  — every lazy variant LOST with MORE driver jobs (the eager
  *         half-round cuts are what make a twice-read normalization
  *         subtree run once). See HitsOps.maxNorm.
  * Results are parity-checksummed against the registered baseline.
  */
object ProfileRoundBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    val h = new ProbeHarness(spark, "rb")

    def registered(name: String): DataFrame =
      GraftBenchShim.stripRootSort(SparkEntry.queries(name)(spark, sfDir))

    // -------------------------------------------------- g5 (historical
    // shapes; the registered query is the cut-between-rounds winner)
    def g5(cutLast: Boolean, cutEvery: Int): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"))
      val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")).distinct()
      var edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .checkpointed()
      for (i <- 1 to 3) {
        val keep = edges.groupBy("src").agg(count(lit(1)).as("d"))
          .filter(col("d") >= 3).select(col("src").as("node"))
        edges = edges
          .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
        if ((i < 3 && i % cutEvery == 0) || (i == 3 && cutLast))
          edges = edges.checkpointed()
      }
      edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg"))
    }

    // -------------------------------------------------- g9 (rejected
    // lazy shapes; the registered HitsOps cuts every half-round)
    def g9(cutAuths: Boolean, cutHubs: Boolean): DataFrame = {
      val edges = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct().checkpointed()
      def norm(raw: DataFrame, key: String, v: String, cut: Boolean): DataFrame = {
        val df = if (cut) raw.checkpointed() else raw
        df.crossJoin(broadcast(df.agg(max(col(v)).as("__mx"))))
          .select(col(key), expr(
            s"CAST((CAST($v AS DECIMAL(38,0)) * 1000000) div __mx AS BIGINT)").as(v))
      }
      var auths = norm(
        edges.groupBy("p").agg((count(lit(1)) * lit(1000000L)).as("a")),
        "p", "a", cutAuths)
      var hubs = norm(
        edges.join(broadcast(auths), Seq("p")).groupBy("s").agg(sum(col("a")).as("h")),
        "s", "h", cutHubs)
      for (_ <- 2 to 2) {
        auths = norm(
          edges.join(broadcast(hubs), Seq("s")).groupBy("p").agg(sum(col("h")).as("a")),
          "p", "a", cutAuths)
        hubs = norm(
          edges.join(broadcast(auths), Seq("p")).groupBy("s").agg(sum(col("a")).as("h")),
          "s", "h", cutHubs)
      }
      auths.select(lit("auth").as("kind"), col("p").as("node"),
          col("a").as("score_micro"))
        .unionByName(hubs.select(lit("hub").as("kind"), col("s").as("node"),
          col("h").as("score_micro")))
    }

    val g5Variants: Seq[(String, () => DataFrame)] = Seq(
      "g5_cutlast" -> (() => g5(cutLast = true, cutEvery = 1)),
      "g5_batch2" -> (() => g5(cutLast = false, cutEvery = 2)))
    val g9Variants: Seq[(String, () => DataFrame)] = Seq(
      "g9_halfcut" -> (() => g9(cutAuths = false, cutHubs = true)),
      "g9_nocut" -> (() => g9(cutAuths = false, cutHubs = false)))

    h.parity(h.sig(registered("g5_kcore_peel")), g5Variants)
    h.parity(h.sig(registered("g9_hits")), g9Variants)
    val all: Seq[(String, () => DataFrame)] =
      Seq("g5_registered" -> (() => registered("g5_kcore_peel"))) ++ g5Variants ++
        Seq("g9_registered" -> (() => registered("g9_hits"))) ++ g9Variants
    for (r <- 1 to reps; (label, b) <- all) h.time(s"$label#$r")(b())
    spark.stop()
  }
}
