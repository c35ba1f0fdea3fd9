package graft.tools

import graft.{Sessions, SparkEntry, Tables}

/** Dev-loop helper: print the formatted physical plan of one registered
  * query (args: sfDir name) — the `.explain("formatted")` step the build
  * discipline asks for after each operator lands.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
