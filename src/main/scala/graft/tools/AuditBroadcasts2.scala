package graft.tools

import graft.{Sessions, SparkEntry, Tables}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Companion probe for AuditBroadcasts' blind spot: list BroadcastExchange
  * subtrees built on CHECKPOINTED lineage (Scan ExistingRDD) so the
  * deliberate sites can be eyeballed against their row-count guards.
  * Descends into AdaptiveSparkPlanExec (a leaf node under AQE) — same
  * r10 fix as AuditBroadcasts.
  *
  * r10 end-state: 27 hits across 12 queries, all reviewed —
  * g1/g10 (dimensionNodes opt-in rank broadcasts), g2/g3 (degree
  * tables behind triangleStats' broadcastEdgeLimit row-count guard),
  * ann_recall (bounded brute-truth table), j3_upsert (bounded-by-
  * |updates| contract), o13/t_pmi (vocab-bounded LM count tables),
  * the dedup_cc family and pipe_dedup (cc star-table lookups on sound
  * checkpointed estimates — the estimate-soundness doctrine). A NEW
  * query on this list without a boundedness argument at its site is
  * the defect. */
object AuditBroadcasts2 {
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
              val ckpt = sub.contains("Scan ExistingRDD")
              val aggregated = sub.contains("Aggregate") || sub.contains("Limit")
              if (ckpt && !aggregated)
                println(s"[audit2] $name: checkpoint-lineage broadcast (no agg):\n" +
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
          println(s"[audit2] $name: SKIP (${e.getClass.getSimpleName})")
      }
    }
    println("[audit2] done")
    spark.stop()
  }
}
