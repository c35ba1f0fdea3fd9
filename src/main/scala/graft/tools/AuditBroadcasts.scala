package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Dev audit: for each registered query (or the names passed as args
  * after sfDir), list BroadcastExchange subtrees whose lineage reaches a
  * FACT table scan (lineitem/orders/events) — the
  * auto-broadcast-under-10MB defect class that cost a19 and coEdges
  * ~0.5-0.7 s each and would OOM at real SF. Blind spot: lineage behind
  * a localCheckpoint reads as "Scan ExistingRDD" (no table name), but
  * every checkpoint+broadcast site in this repo is an explicit,
  * guarded choice — the implicit defect only arises on lazy fact
  * lineage, which this audit sees.
  *
  * r10 fix: the walk must DESCEND into AdaptiveSparkPlanExec —
  * Sessions enables AQE, whose root node is a LEAF (children = Nil),
  * so the original children-only walk visited nothing and the early
  * "zero hits across 246 plans" record was vacuous. The re-run with
  * the descent found j13_interval_overlap broadcasting an exploded
  * lineitem side (fixed via shuffle_hash in RangeJoinOps).
  *
  * r10 review state for the EXPLODE-under-broadcast detector: every
  * hit is justified — the ann_* sides are the contract-bounded QUERY
  * batches (explicit broadcast(q), constant probe/table fan-out over a
  * filter-bounded batch) and dedup_near_incremental's band table is a
  * constant-4 posexplode, so the estimate is sound up to that constant
  * and AQE still flips to keyed joins at scale. The defect the
  * detector exists for is DATA-DEPENDENT fan-out (j13's sequence
  * bins), where the estimate cannot be trusted at any scale.
  *
  * r10 end-state disposition of the agg=false fact-reaching hits —
  * this is a REVIEW tool, not a zero-tolerance gate, and these are the
  * reviewed leave-as-is classes (the estimate-soundness doctrine, see
  * the connectedComponents rationale in GraphOps):
  *  - ann_* / ann_trunc_recall: the explicitly-broadcast bounded QUERY
  *    batches (embeddings lineage triggers the fact match).
  *  - a36/j5_semi/j5_anti/dedup_cc_best/dedup_near_incremental:
  *    plain-scan or constant-explode sides with SOUND size estimates —
  *    AQE flips them to keyed joins exactly when real sizes demand;
  *    hard hints measured 0.1-2 s slower per query with no scale
  *    benefit. A NEW unreviewed agg=false hit is what warrants a look,
  *    especially one with data-dependent fan-out below the exchange. */
object AuditBroadcasts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val q = SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))
        val plan = q(spark, sfDir).queryExecution.executedPlan
        def walk(p: SparkPlan): Unit = {
          p match {
            case b: BroadcastExchangeExec =>
              val sub = b.child.toString
              // documents/embeddings ARE the 100 TB corpus tables — a
              // broadcast reaching them is as suspect as one reaching
              // lineitem (r10 list extension; the original three-table
              // list was a blind spot over the dedup/ANN family).
              val factScan = Seq("lineitem", "orders.parquet", "events",
                  "documents", "embeddings")
                .exists(sub.contains)
              // Aggregation does NOT imply dimension-bounded (a distinct
              // over (o,p) is still fact-sized) — flag every
              // fact-reaching broadcast and review by eye; the marker
              // distinguishes raw fan-outs from keyed reductions.
              val aggregated = sub.contains("Aggregate") || sub.contains("Limit")
              if (factScan)
                println(s"[audit] $name: fact-reaching broadcast (agg=$aggregated):\n" +
                  sub.linesIterator.take(3).map("    " + _.trim.take(110)).mkString("\n"))
              // The estimate-soundness doctrine's red flag: a Generate
              // (explode) below a broadcast means the size estimate that
              // justified the broadcast is structurally untrustworthy —
              // post-explode row counts are data-dependent (the j13
              // class). Review each hit for a bounded fan-out argument.
              if (sub.contains("Generate ") && !aggregated)
                println(s"[audit] $name: EXPLODE under broadcast (estimate unsound):\n" +
                  sub.linesIterator.take(3).map("    " + _.trim.take(110)).mkString("\n"))
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case _ =>
          }
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
        }
        walk(plan)
      } catch {
        case e: Throwable =>
          println(s"[audit] $name: SKIP (${e.getClass.getSimpleName})")
      }
    }
    println("[audit] done")
    spark.stop()
  }
}
