package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.Checkpoints.CheckpointSyntax

/** Dev probe (r13): same-JVM A/B of ROUND-BATCHING the eager lineage
  * cuts in the iterative family (r12 VERDICT item 1 — the drift
  * postmortem proved wall time ≈ job count × the host's driver-side
  * planning floor, so fewer materialization barriers should win both
  * locally and at cluster scale).
  *
  * Variants, alternating GC-separated reps in ONE JVM (the only valid
  * comparison on this host — see Bench scaladoc):
  *   g5  (k-core peel, 3 rounds, cut per round today):
  *     cur      — cut after every round including the last
  *     nolast   — cut between rounds only; the final round flows lazily
  *                into the terminal degree aggregate (the last cut's
  *                only consumer reads it ONCE, so the materialization
  *                is pure overhead)
  *     batch2   — cut every 2nd round only (round 1 lazy: its subtree
  *                is re-entered by round 2's degree pass + semi-joins,
  *                bounded ×3, physical exchange reuse collapses the
  *                identical aggregates)
  *   g9  (HITS, 2 full rounds = 4 max-normalized half-rounds, every
  *        half-round's raw aggregate cut today):
  *     cur      — the operator as registered (HitsOps)
  *     halfcut  — cut HUB half-rounds only; auth half-rounds stay lazy
  *                (their raw subtree duplicates ×2 into the max agg +
  *                projection, rooted at the previous cut — bounded)
  *     nocut    — no half-round cuts at all (the 2^(2·iters) logical
  *                replication the eager cuts exist to stop; measures
  *                whether planning cost or job count dominates)
  *
  * Each variant's RESULT is checksummed against the current form once
  * (first rep) so a faster-but-wrong shape cannot win.
  */
object ProfileRoundBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)

    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })

    def cooldown(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => DataFrame): Unit = {
      cooldown()
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      noop(f)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[rb] $tag%-16s $dt%6.3f s  jobs=${jobCount.get() - j0}")
    }
    /** order-insensitive value checksum */
    def sig(df: DataFrame): Long =
      df.select((xxhash64(df.columns.map(col): _*) % 1000000007L).as("h"))
        .agg(sum("h")).head.getLong(0)

    // ------------------------------------------------------------- g5
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

    // ------------------------------------------------------------- g9
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

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "g5_cur" -> (() => g5(cutLast = true, cutEvery = 1)),
      "g5_nolast" -> (() => g5(cutLast = false, cutEvery = 1)),
      "g5_batch2" -> (() => g5(cutLast = false, cutEvery = 2)),
      "g9_cur" -> (() => g9(cutAuths = true, cutHubs = true)),
      "g9_halfcut" -> (() => g9(cutAuths = false, cutHubs = true)),
      "g9_nocut" -> (() => g9(cutAuths = false, cutHubs = false)))

    // Parity first: every variant must agree with its family's current
    // form before any timing is trusted.
    val s5 = sig(g5(cutLast = true, cutEvery = 1))
    val s9 = sig(g9(cutAuths = true, cutHubs = true))
    variants.foreach { case (tag, b) =>
      val s = sig(b())
      val ref = if (tag.startsWith("g5")) s5 else s9
      println(s"[rb] parity $tag ${if (s == ref) "OK" else s"MISMATCH ($s vs $ref)"}")
      require(s == ref, s"$tag parity")
    }
    for (r <- 1 to reps; (tag, b) <- variants) time(f"$tag#$r")(b())
    spark.stop()
  }
}
