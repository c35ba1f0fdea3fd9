package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.BfsOps

/** Round-8 beyond-reference operators (SURVEY §2.11), association /
  * drift / graph-reach family: PMI collocation mining, exact two-sample
  * Kolmogorov–Smirnov drift, and bounded-hop multi-source BFS. Every
  * oracle replays the operator's exact integer arithmetic (house lnq /
  * fixed-point discipline — see RetrievalQueries.lnqSql).
  */
object AssocQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def lnFp(x: String): String =
    s"CAST(floor(CAST(1000000 AS DOUBLE) * ln(CAST($x AS DOUBLE))) AS BIGINT)"

  // ------------------------------------------------------- t_pmi_pairs

  /** T-PMI: top-20 adjacent-word collocations by pointwise mutual
    * information with a minimum-support floor — the phrase-mining
    * primitive (Mikolov-style word2phrase, quality-signal multiword
    * detection) that complements a19's market-basket lift on the text
    * side: support alone surfaces "of the"; PMI surfaces pairs that
    * co-occur far above independence.
    *
    *   pmi = ln( p(w1 w2) / (p(w1) p(w2)) )
    *       = ln c12 + 2 ln N1 − ln N12 − ln c1 − ln c2
    *
    * and each ln lands on a DISTINCT INTEGER (a count or a total), so
    * quantizing every term separately as lnq(n) = floor(1e6·ln n) makes
    * pmi_fp pure integer addition — the t_unigram_nll exactness
    * argument; no product of counts is ever formed, so nothing can
    * overflow regardless of corpus size. Bigrams ride the same
    * codegen'd kgrams kernel as t_bigram_nll (contains-space filter ≙
    * the oracle's range(1, len) construction).
    *
    * Scale shape: two corpus tokenizer passes fold to vocab-bounded
    * count tables (map-side combined); the support floor prunes the
    * candidate set BEFORE the two unigram joins (AQE broadcasts while
    * the vocab fits); totals ride 1-row broadcasts; the global top-20
    * is orderBy+limit = TakeOrdered (a bounded per-partition heap,
    * never a full sort — the a19 pin). */
  private val pmiMinSupport = 3
  private val pmiK = 20
  private val pmi: Q = (s, dir) => {
    val docs = Tables.fanOut(t(s, dir, "documents"))
    val bg = docs
      .select(explode(expr("kgrams(ascii_alpha_tokens(text, 3), 2)")).as("bg"))
      .filter(col("bg").contains(" "))
    val c12 = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
    val n12 = c12.agg(sum(col("c12")).as("n12"))
    val uni = docs
      .select(explode(expr("ascii_alpha_tokens(text, 3)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val n1 = uni.agg(sum(col("cnt")).as("n1"))
    c12.filter(col("c12") >= pmiMinSupport)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("cnt").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n12)).crossJoin(broadcast(n1))
      .select(col("w1"), col("w2"), col("c12").as("support"),
        (expr(lnFp("c12")) + lit(2L) * expr(lnFp("n1")) - expr(lnFp("n12")) -
          expr(lnFp("c1")) - expr(lnFp("c2"))).as("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("w1"), col("w2"))
      .limit(pmiK)
      .orderBy(col("pmi_fp").desc, col("w1"), col("w2"))
  }
  private val pmiSql =
    s"""WITH tok AS (
       |  SELECT regexp_extract_all(lower(text), '[a-z]{3,}') AS toks
       |  FROM documents),
       |bgr AS (
       |  SELECT array_to_string(toks[j:j+1], ' ') AS bg
       |  FROM (SELECT toks, unnest(range(1, len(toks))) AS j FROM tok)),
       |c12 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM bgr GROUP BY bg),
       |n12 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n12 FROM c12),
       |uni AS (SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |  SELECT unnest(toks) AS t FROM tok) GROUP BY t),
       |n1 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n1 FROM uni),
       |sel AS (
       |  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
       |    c12 AS support
       |  FROM c12 WHERE c12 >= $pmiMinSupport),
       |sc AS (
       |  SELECT w1, w2, support,
       |    ${lnFp("support")} + 2 * (SELECT ${lnFp("n1")} FROM n1)
       |      - (SELECT ${lnFp("n12")} FROM n12)
       |      - ${lnFp("a.cnt")} - ${lnFp("b.cnt")} AS pmi_fp
       |  FROM sel JOIN uni a ON sel.w1 = a.w JOIN uni b ON sel.w2 = b.w)
       |SELECT w1, w2, support, pmi_fp FROM sc
       |ORDER BY pmi_fp DESC, w1, w2 LIMIT $pmiK""".stripMargin

  // -------------------------------------------------------- t_ks_drift

  /** T-KS: exact two-sample Kolmogorov–Smirnov statistic between the
    * en-slice and rest-of-corpus document-length distributions — the
    * nonparametric drift test that completes the drift trio (t_kl_drift
    * distributional, t_psi_drift binned): KS is binning-free, sensitive
    * to ANY CDF gap, and its D statistic is exact integer math —
    * D·nP·nQ = max over the value spine of |F_P(v)·nQ − F_Q(v)·nP|,
    * cross-multiplied so no rational is ever formed (the PSI
    * discipline); products accumulate in DECIMAL(38,0) ≙ HUGEINT since
    * cum·n grows quadratically past BIGINT near ~3e9 rows/side.
    *
    * Scale shape: one map-side-combined aggregate folds the corpus to
    * the distinct-value spine (bounded by the value DOMAIN — document
    * lengths, not documents); the cumulative window runs over that
    * spine only, never data rows (the a16/t_heaps spine rule); totals
    * ride a 1-row broadcast; the argmax row is TakeOrdered(1) with the
    * (D desc, value) tie-break making the reported location engine-
    * deterministic. */
  private val ks: Q = (s, dir) => {
    val docs = t(s, dir, "documents").filter(col("n_chars").isNotNull)
    val spine = docs.groupBy("n_chars")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cp"),
        sum(when(col("lang") === "en", 0L).otherwise(1L)).as("cq"))
    val w = Window.orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = docs.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("np"),
      sum(when(col("lang") === "en", 0L).otherwise(1L)).as("nq"))
    spine
      .withColumn("fp", sum(col("cp")).over(w))
      .withColumn("fq", sum(col("cq")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n_chars"), col("np"), col("nq"),
        abs(col("fp").cast("decimal(38,0)") * col("nq") -
          col("fq").cast("decimal(38,0)") * col("np")).as("dnum"))
      .orderBy(col("dnum").desc, col("n_chars"))
      .limit(1)
      .select(col("np").as("n_en"), col("nq").as("n_other"),
        col("n_chars").as("at_chars"),
        expr("CAST((dnum * 1000000) div (np * nq) AS BIGINT)").as("ks_d_ppm"))
  }
  private val ksSql =
    """WITH d AS (SELECT lang, n_chars FROM documents WHERE n_chars IS NOT NULL),
      |spine AS (
      |  SELECT n_chars,
      |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
      |    SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cq
      |  FROM d GROUP BY n_chars),
      |cum AS (
      |  SELECT n_chars,
      |    SUM(cp) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
      |    SUM(cq) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fq
      |  FROM spine),
      |tot AS (
      |  SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS nq
      |  FROM d)
      |SELECT np AS n_en, nq AS n_other, n_chars AS at_chars,
      |  CAST((dnum * 1000000) // (np * nq) AS BIGINT) AS ks_d_ppm
      |FROM (
      |  SELECT n_chars, np, nq,
      |    abs(CAST(fp AS HUGEINT) * nq - CAST(fq AS HUGEINT) * np) AS dnum
      |  FROM cum, tot
      |  ORDER BY dnum DESC, n_chars LIMIT 1)""".stripMargin

  // -------------------------------------------------------- g4_bfs_hops

  /** G4: bounded-hop multi-source BFS over the g1 bipartite
    * supplier↔part graph — hop distance from a seed set (node ≡ 0
    * mod 97, a scattered ~1% sample across both namespaces) after 3
    * rounds, -1 = unreached. See BfsOps for the per-round shuffle
    * shape; `assumeDistinct` holds by the g1 mirror-of-distinct
    * construction (disjoint odd/even namespaces). */
  private val bfsSeedMod = 97
  private val bfsHops = 3
  private val g4: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_partkey"))
    val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst")).distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .filter(col("node") % bfsSeedMod === 0)
    BfsOps.multiSourceBfs(edges, "src", "dst", seeds,
        maxHops = bfsHops, assumeDistinct = true)
      .orderBy("node")
  }
  private def g4Round(i: Int): String =
    s"""d$i AS (
       |  SELECT node, MIN(h) AS h FROM (
       |    SELECT node, h FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst, d${i - 1}.h + 1 FROM e JOIN d${i - 1} ON e.src = d${i - 1}.node)
       |  GROUP BY node)""".stripMargin
  private val g4Sql =
    s"""WITH e AS (
       |  SELECT DISTINCT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst
       |  FROM lineitem
       |  UNION
       |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem),
       |n AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
       |d0 AS (SELECT node, CAST(0 AS BIGINT) AS h FROM n WHERE node % $bfsSeedMod = 0),
       |${(1 to bfsHops).map(g4Round).mkString(",\n")}
       |SELECT n.node, CAST(COALESCE(d$bfsHops.h, -1) AS BIGINT) AS hops
       |FROM n LEFT JOIN d$bfsHops ON n.node = d$bfsHops.node
       |ORDER BY n.node""".stripMargin

  // ------------------------------------------------------------ maps

  val queries: Map[String, Q] = Map(
    "t_pmi_pairs" -> pmi,
    "t_ks_drift" -> ks,
    "g4_bfs_hops" -> g4)

  val oracle: Map[String, String] = Map(
    "t_pmi_pairs" -> pmiSql,
    "t_ks_drift" -> ksSql,
    "g4_bfs_hops" -> g4Sql)
}
