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
  * lineitem side (fixed via shuffle_hash in RangeJoinOps). */
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
