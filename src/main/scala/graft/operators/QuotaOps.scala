package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quota (stratified) sampling to a TARGET corpus mix — the "data
  * mixing" step of a training pipeline: given per-stratum target weights
  * (domain/language proportions a la Pile/Dolma mixture tables), draw a
  * deterministic sample whose composition matches the weights as closely
  * as the data allows (a stratum short of its quota contributes
  * everything it has — quotas never invent rows).
  *
  * Beyond-reference operator (SURVEY §2.11); generalizes O4's
  * per-group fractional sample from one global pct to per-stratum
  * quotas derived from a weight table.
  *
  * Scale shape: per-stratum counts are one aggregate (rows = number of
  * strata, broadcast back); selection is rank-by-hash ≤ quota inside
  * each stratum — one shuffle of the fact table on the stratum key. The
  * hash order makes the draw deterministic and REPLAYABLE: re-running on
  * the same corpus draws the same sample (SURVEY §7.4 determinism
  * contract), and an engine-independent oracle can replay it as plain
  * window SQL. For tiny quota fractions compose with SampleOps-style
  * hash-prefix prefiltering on the same hash order; at mixing-typical
  * rates (tens of percent) the prefilter would keep most rows anyway.
  */
object QuotaOps {

  /** Sample `df` to `ceil(totalN * weight_s)` rows per stratum (capped by
    * the stratum's size). Strata absent from `weights` get quota 0.
    * `hashCol` must be a deterministic per-row scrambling (see
    * SketchOps.portableHash); `tieCols` break hash ties to keep the rank
    * total. Weights need not sum to 1 — they are treated as fractions of
    * `totalN` directly, so over- or under-specified mixes do what the
    * numbers say. */
  def quotaSample(
      df: DataFrame, stratumCol: String, weights: Map[String, Double],
      totalN: Long, hashCol: Column, tieCols: Seq[Column]): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be finite and non-negative")
    quotaByCount(df, stratumCol,
      weights.map { case (s, w) => s -> math.ceil(totalN * w).toLong },
      hashCol, tieCols)
  }

  /** Shared quota core: keep the first `quotas(s)` rows of each stratum
    * in (hash, tie) order; strata absent from the map get quota 0. The
    * quota map rides the plan as a literal CASE — strata counts are
    * bounded (a mixture table is human-curated), never data-sized. */
  def quotaByCount(
      df: DataFrame, stratumCol: String, quotas: Map[String, Long],
      hashCol: Column, tieCols: Seq[Column]): DataFrame = {
    require(quotas.values.forall(_ >= 0), "quotas must be non-negative")
    require(!df.columns.contains("__q_rn"), "input may not carry __q_rn")
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (s, q)) =>
      when(col(stratumCol) === s, lit(q)).otherwise(acc)
    }
    df.withColumn("__q_rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(hashCol +: tieCols: _*)))
      .filter(col("__q_rn") <= quota)
      .drop("__q_rn")
  }

  /** α = 0.5 temperature rebalancing (the multilingual-mix flattening of
    * XLM-R / mC4): the target share of stratum s is ∝ √n_s, so dominant
    * languages shrink and tail languages grow relative to the raw mix,
    * then `totalN` rows are drawn to that target by rank-by-hash (the
    * same deterministic, replayable draw as [[quotaSample]] — a stratum
    * short of its quota contributes everything it has).
    *
    * α is FIXED at 1/2 on purpose: IEEE-754 requires sqrt to be
    * correctly rounded, so floor(sqrt(n)) is bit-identical in every
    * engine and the quota arithmetic below — quota_s = totalN·isqrt_s
    * div Σ isqrt — is exact integer math an independent SQL oracle can
    * replay. An arbitrary α needs pow(), which is NOT correctly rounded,
    * and one ULP under a ceil flips a quota by a whole row. (A caller
    * who wants another α can precompute quotas driver-side and call
    * [[quotaByCount]] — the draw itself is α-agnostic.)
    *
    * Scale shape: per-stratum counts are one aggregate whose result is
    * stratum-cardinality-sized (languages: dozens — collected, never the
    * corpus); selection is the quota core's single shuffle of the fact
    * table on the stratum key. */
  def sqrtTemperatureSample(
      df: DataFrame, stratumCol: String, totalN: Long,
      hashCol: Column, tieCols: Seq[Column]): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    val counts = df.groupBy(stratumCol).count().collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
    val isqrt = counts.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble)).toLong }
    val den = isqrt.map(_._2).sum
    val quotas = isqrt.map { case (s, r) => s -> totalN * r / den }.toMap
    quotaByCount(df, stratumCol, quotas, hashCol, tieCols)
  }

  /** Deterministic train/val/test assignment: reduce `hashCol` into
    * `den` buckets, label by cumulative slice ranges (e.g.
    * Seq("train"->8, "val"->1, "test"->1) → buckets 0–7/8/9 of den=10).
    * Purely row-local — no shuffle, no state, and the same row lands in
    * the same split on every engine and every re-run, which is the
    * property that keeps eval sets uncontaminated as the corpus
    * regenerates.
    *
    * `hashCol` must be a NON-NULL INTEGER scrambling of the row's
    * identity — `SketchOps.portableHash(idCol)` for numeric row ids,
    * `conv(substring(md5(textCol), 1, 8), 16, 10).cast("long")` for a
    * CONTENT key (prefer a content key when near-duplicate rows must
    * never straddle splits). The caller-supplied-column convention
    * (same as [[quotaSample]]) exists precisely so a string key cannot
    * be silently cast to a NULL hash: a row whose hash IS null gets
    * split = null rather than a wrong bucket, and the null-count is the
    * caller's audit signal. */
  def hashSplit(df: DataFrame, hashCol: Column,
      slices: Seq[(String, Int)]): DataFrame = {
    require(slices.nonEmpty && slices.forall(_._2 > 0),
      "slices must be positive")
    require(!df.columns.contains("split"), "input may not carry a split column")
    val den = slices.map(_._2).sum
    val bucket = hashCol % den
    val (cases, _) = slices.foldLeft((lit(null).cast("string"), 0L)) {
      case ((acc, lo), (name, width)) =>
        (when(bucket >= lo && bucket < lo + width, lit(name)).otherwise(acc),
          lo + width)
    }
    df.withColumn("split", cases)
  }

  /** Domain-frequency capping (RefinedWeb/CCNet-style): no single domain
    * may contribute more than `maxShare` of the corpus. Dual of
    * [[quotaSample]] — quotas PULL strata toward a target mix from a
    * curated weight table; the cap PUSHES DOWN whatever dominates, with
    * no per-domain table at all (web crawls have millions of domains; a
    * human-curated weight map cannot exist at that cardinality).
    *
    * cap = max(minKeep, ceil(total · shareNum/shareDen)); domains under
    * the cap keep everything. The share is a RATIONAL, not a double: the
    * cap is data-dependent in-plan math, and ceil over a double product
    * is not portable (DuckDB parses `0.15` as DECIMAL, Spark as double —
    * one ULP apart at a ceil boundary flips the cap by one), while
    * (total·num + den−1) div den is exact long arithmetic in any engine.
    * Survivors are chosen in HASH order, not crawl
    * order — head-of-crawl pages are systematically homepage-like, so
    * rank-by-id capping would bias the kept sample; rank-by-hash is a
    * uniform draw and replays deterministically (same corpus → same
    * survivors, and a second engine can replay the draw as window SQL).
    *
    * Scale shape: the total is one scalar aggregate (crossJoin of a
    * 1-row broadcast, not a driver collect); selection is one shuffle
    * of the fact table on the domain key. A domain at maxShare of 100 TB
    * is a hot partition — for those corpora compose with SampleOps-style
    * hash-prefix prefiltering on the same hash order (only rows whose
    * hash can possibly rank ≤ cap enter the window), which this keeps
    * composable by ranking on the caller-supplied `hashCol` itself. */
  def domainCap(
      df: DataFrame, domainCol: String, shareNum: Long, shareDen: Long,
      minKeep: Long, hashCol: Column, tieCols: Seq[Column]): DataFrame = {
    require(shareNum > 0 && shareDen > 0 && shareNum <= shareDen,
      "share must be a rational in (0, 1]")
    require(minKeep >= 1, "minKeep must be >= 1")
    require(!df.columns.exists(c => c == "__c_rn" || c == "__c_total"),
      "input may not carry __c_rn/__c_total")
    val totals = df.groupBy().agg(count(lit(1)).as("__c_total"))
    val cap = greatest(lit(minKeep),
      expr(s"(__c_total * $shareNum + ${shareDen - 1}) div $shareDen"))
    df.crossJoin(broadcast(totals))
      .withColumn("__c_rn", row_number().over(
        Window.partitionBy(col(domainCol)).orderBy(hashCol +: tieCols: _*)))
      .filter(col("__c_rn") <= cap)
      .drop("__c_rn", "__c_total")
  }
}
