package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.operators.RegroupOps

/** W3 ★ — the order-dependent stateful sentence regroup, driven over the
  * documents table (sentence-split first), with a recursive-CTE oracle
  * that replays the exact fold: accumulate word counts, emit at
  * threshold=20, keep the tail iff wc >= threshold//2 = 10.
  */
object StatefulQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val w3: Q = (s, dir) => {
    val sentences = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(text, '[^.!?]+[.!?]?', 0)"))
          .as(Seq("idx", "raw_sentence")))
      .select(col("doc_id"), (col("idx") + 1).as("rn"),
        trim(col("raw_sentence")).as("sentence"))
      .withColumn("wc", TextFns.word_count(col("sentence")).cast("long"))
    RegroupOps.regroupSentences(sentences, "doc_id", "rn", "sentence", "wc", 20)
      .orderBy("doc_id", "grp_idx")
  }

  private val w3Sql =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, CAST(gs AS INT) AS rn, trim(raw_s) AS sentence,
      |    CASE WHEN trim(regexp_replace(trim(raw_s), '\s+', ' ', 'g')) = '' THEN 0
      |         ELSE len(string_split(trim(regexp_replace(trim(raw_s), '\s+', ' ', 'g')), ' ')) END AS wc
      |  FROM (SELECT doc_id, unnest(arr) AS raw_s, generate_subscripts(arr, 1) AS gs
      |        FROM (SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]?') AS arr FROM documents) t)),
      |st AS (
      |  SELECT doc_id, rn, sentence AS acc_text, wc AS acc_wc, wc >= 20 AS emit
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.doc_id, s.rn,
      |    CASE WHEN st.emit THEN s.sentence ELSE st.acc_text || ' ' || s.sentence END,
      |    CASE WHEN st.emit THEN s.wc ELSE st.acc_wc + s.wc END,
      |    (CASE WHEN st.emit THEN s.wc ELSE st.acc_wc + s.wc END) >= 20
      |  FROM st JOIN s ON s.doc_id = st.doc_id AND s.rn = st.rn + 1)
      |SELECT doc_id, CAST(gid AS INT) AS grp_idx, acc_text AS grp_text, acc_wc AS grp_wc
      |FROM (
      |  SELECT doc_id, rn, acc_text, acc_wc, emit,
      |    COALESCE(SUM(CASE WHEN emit THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY doc_id ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gid,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY rn DESC) AS rrn
      |  FROM st)
      |WHERE emit OR (rrn = 1 AND NOT emit AND acc_wc >= 10)
      |ORDER BY doc_id, grp_idx""".stripMargin

  val queries: Map[String, Q] = Map("w3_sentence_regroup" -> w3)
  val oracle: Map[String, String] = Map("w3_sentence_regroup" -> w3Sql)
}
