package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

import graft.{Sessions, SparkEntry, Tables}

/** Dev audit #2 for the recompute defect class: find REPEATED exchange
  * subtrees inside one executed plan that Catalyst did NOT collapse
  * into a ReusedExchange — i.e. the same shuffle/broadcast build work
  * scheduled twice. Complements AuditRecompute (which greps for named
  * row-local kernels): this one catches duplicated SHUFFLED subtrees
  * regardless of what expressions they contain.
  *
  * Duplicates are grouped by the exchange child's canonicalized form.
  * A hit is a CANDIDATE: exchange reuse only kicks in when the whole
  * exchange (including partitioning) matches, and some duplicates are
  * measured-cheaper than a checkpoint. Zero hits is the clean state.
  * Not part of the query surface. */
object AuditRecompute2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)

    def exchanges(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
        case e: Exchange => Seq(e) ++ e.children.flatMap(exchanges)
        case _: ReusedExchangeExec => Seq.empty // already deduped
        case other => other.children.flatMap(exchanges) ++
          other.subqueries.flatMap(exchanges)
      }
      self
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan
        val dups = exchanges(plan)
          .groupBy(_.canonicalized.toString)
          .filter(_._2.length >= 2)
        if (dups.nonEmpty) {
          flagged += 1
          val desc = dups.map { case (_, v) =>
            val childName = v.head.children.headOption
              .map(_.nodeName).getOrElse("?")
            s"${v.length}x ${v.head.nodeName}($childName)"
          }.mkString(" ")
          println(s"[audit2] $name  $desc")
        }
      } catch {
        case e: Throwable =>
          println(s"[audit2] $name  <plan failed: ${e.getClass.getSimpleName}>")
      }
    }
    println(s"[audit2] flagged $flagged of ${names.size}")
    spark.stop()
  }
}
