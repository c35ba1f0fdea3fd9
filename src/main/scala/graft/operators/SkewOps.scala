package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overload single tasks at
  * scale (SURVEY §6 scale risks; the crawler's source column has ~2
  * values and book popularity is Zipfian). AQE's skew-join split handles
  * sort-merge cases adaptively; this operator is the explicit salting
  * form for when the small side fits in memory per key but a hot key's
  * rows must still spread over many tasks — e.g. joining utterances to
  * per-book metadata where one book dominates a crawl batch.
  */
object SkewOps {

  /** Equi-join `large ⋈ small` on `keys`, with the large side's rows
    * scattered over `saltBuckets` sub-keys and the small side replicated
    * once per bucket. Result is row-identical to the plain inner join;
    * the shuffle key becomes (keys..., salt) so a hot key occupies
    * `saltBuckets` tasks instead of one. Replication cost is
    * |small| × saltBuckets — size saltBuckets to the observed skew
    * factor, not higher.
    *
    * The salt is `pmod(hash(*), saltBuckets)` over the large side's whole
    * row (cheap, deterministic per row content, uniform enough); rand()
    * would also work but makes task retries non-deterministic.
    */
  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(keys.nonEmpty, "need at least one join key")
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    // Replication is ×saltBuckets row expansion BEFORE the shuffle write —
    // on a narrow scan (one task) the explode and its shuffle write run
    // serial. fanOut is widen-only: identity whenever the small side
    // already has >= session-parallelism splits (any real scale), and at
    // fixture scale it spreads the expansion (measured: 1.48 -> 1.26 s
    // median on j9; fanning the LARGE side too costs more than it saves —
    // its exchange is the salt shuffle itself).
    val replicated = graft.Tables.fanOut(small).withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // shuffle_hash on the replicated side: the operator's contract is
    // "small fits in memory per key", so a hash build there is safe and
    // skips sort-merge's two full sorts of the salted shuffle (the same
    // measured trade as j7's zip join; sorting the REPLICATED rows is
    // pure overhead — the join output is re-aggregated or re-sorted by
    // every caller anyway).
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt").drop("__salt")
  }
}
