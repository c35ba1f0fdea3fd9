package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DedupOps

/** Dev probe (r15, VERDICT directive 5): run the containment recall
  * audit — [[graft.operators.DedupOps.containmentRecall]] — at the
  * registered dedup_containment query's standing parameters (word
  * 3-gram shingles, dfCap 50, 600000 ppm gate) with the
  * dedup_lsh_recall probe bound (lower id < 50), on real testdata.
  * The printed row is the measured number the operator scaladoc
  * cites; the registry stays frozen at 246, so this probe is the
  * audit's execution surface.
  */
object ProfileContainRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)

    val docs = Tables.fanOut(Tables.load(spark, sfDir, "documents"))
    val t0 = System.nanoTime()
    val rows = DedupOps.containmentRecall(docs, "doc_id",
        expr("distinct_kgrams(ascii_tokens(text), 3)"),
        dfCap = 50, minContainPpm = 600000L, probeBound = 50L)
      .collect()
    val dt = (System.nanoTime() - t0) / 1e9
    rows.foreach(r => println(f"[cr] $sfDir ${r.mkString(" | ")}  (${dt}%.2f s)"))
    spark.stop()
  }
}
