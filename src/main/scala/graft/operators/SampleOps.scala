package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators (SURVEY §2.6 O3/O4; reference
  * whisper_qc.py:231-239 per-group fractional sample, crawler/utils.py
  * :61-65 random.sample). Randomness is md5-keyed so reruns and the
  * DuckDB oracle draw identical rows (SURVEY §7.4).
  */
object SampleOps {

  /** Per-group fractional sample with a minimum of one row per group:
    * keeps the `ceil(pct * n)`-smallest-by-hash rows of each group — the
    * reference's `int(n*pct) or 1` clamp (whisper_qc.py:231-239), with
    * `floor` + `greatest(_, 1)` spelling that rule.
    *
    * Scale shape: the naive form ranks EVERY row in a single window —
    * per-group parallelism, full-table sort. Selecting the k smallest
    * hashes only needs the rows whose hash can possibly rank <= k, so:
    *
    *   1. one pre-aggregation per group computes `cnt` (exact n) and
    *      `scnt`, the rows satisfying `survivor(hash)` — a prefix of the
    *      hash order covering a superset fraction of pct (the default
    *      keeps the 2-hex-digit md5 prefixes <= "0a": 11/256 ~ 4.3%,
    *      for pct = 1%);
    *   2. the ranking window then sorts ONLY the survivor rows — because
    *      the survivor set is a prefix of the hash order, the k smallest
    *      hashes are all survivors whenever scnt >= k;
    *   3. any group where scnt < k (tiny groups, where the min-1 clamp
    *      lives) is kept WHOLE, so the rank is exact there too — no
    *      probabilistic gamble, the fallback is part of the plan.
    *
    * The group-stats side is a broadcast (one row per group), so the
    * only shuffle of real data is the window over ~4% of the input.
    *
    * `survivor` MUST be a threshold on the hash order (h <= bound) or the
    * prefix argument above breaks. The default md5-prefix test is fully
    * portable; for hot paths prefer a cheap arithmetic hash column with
    * `h => h <= lit(bound)` — a crypto hash buys nothing for sampling and
    * costs ~10x the integer mix on every row of both scans.
    */
  def groupFractionalSample(
      df: DataFrame, groupCols: Seq[String], hashCol: Column,
      tieCols: Seq[Column], pct: Double = 0.01,
      survivor: Column => Column = h => substring(h, 1, 2) <= "0a"): DataFrame = {
    require(pct > 0 && pct <= 1, "pct must be in (0, 1]")
    // Internal columns are __-prefixed so an input that already carries a
    // `cnt`/`scnt` column cannot alias into the stats join. Null group keys
    // are EXCLUDED (inner equi-join semantics) — same policy as SQL GROUP BY
    // feeding a join; filter/coalesce null keys upstream if they must sample.
    require(!groupCols.exists(c => c == "__cnt" || c == "__scnt" || c == "__rn"),
      "group columns may not use reserved __cnt/__scnt/__rn names")
    val gcols = groupCols.map(col)
    val k = greatest(floor(col("__cnt") * pct), lit(1L))
    val stats = df.groupBy(gcols: _*).agg(
      count(lit(1)).as("__cnt"),
      count(when(survivor(hashCol), 1)).as("__scnt"))
    df.join(broadcast(stats), groupCols)
      .filter(survivor(hashCol) || col("__scnt") < k)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(gcols: _*).orderBy(hashCol +: tieCols: _*)))
      .filter(col("__rn") <= k)
      .drop("__cnt", "__scnt", "__rn")
  }
}
