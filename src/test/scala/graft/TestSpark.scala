package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder(master = "local[4]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
