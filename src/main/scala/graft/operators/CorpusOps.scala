package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency operators: decisions about a line/fragment that
  * depend on how many DOCUMENTS it appears in — the C4/RefinedWeb-style
  * boilerplate pass (navigation chrome, cookie banners, shared
  * headers/footers repeat across a crawl; real prose doesn't).
  */
object CorpusOps {

  /** Remove lines that occur in at least `minDocs` distinct documents,
    * preserving each document's remaining line order.
    *
    * Scale shape (100 TB): pass 1 aggregates distinct-doc counts with
    * ONE shuffle on the line hash (map-side partial counts); the
    * surviving boilerplate set is tiny BY CONSTRUCTION (a line must
    * recur across >= minDocs documents to qualify), so pass 2's
    * left_anti join broadcasts it against the exploded lines — AQE picks
    * the broadcast automatically at that size. Reassembly sorts
    * in-group: array_sort over (pos, line) structs inside the collected
    * group, not a global sort. Blank lines are never treated as
    * boilerplate (they'd match across every document trivially) — they
    * are preserved verbatim through reassembly. A document consisting
    * ENTIRELY of boilerplate drops out of the result (it has no content
    * left to carry). */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String, minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .filter(trim(col("__line")) =!= "")
      .groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__line")
    val kept = lines.join(boiler,
      lines("__line") === boiler("__line"), "left_anti")
    kept
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__pos"), col("__line"))).as("__parts"))
      .select(col(idCol),
        array_join(
          transform(array_sort(col("__parts")), p => p("__line")),
          "\n").as("text"))
  }
}
