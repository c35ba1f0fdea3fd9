package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Portable one-pass sketches (beyond-reference, SURVEY §2.11).
  *
  * Design rule: every sketch here is built from a PORTABLE integer hash
  * (the same arithmetic both Spark and the DuckDB oracle can evaluate
  * bit-for-bit) and an ORDER-INDEPENDENT summary (k smallest distinct
  * values), so the estimate itself — not just some error bound — replays
  * exactly in any engine. Opaque binary sketches (Spark's HyperLogLog++
  * in `approx_count_distinct`, `count_min_sketch`) estimate the same
  * quantities but cannot be cross-checked value-for-value against a
  * second engine; when an oracle-exact contract matters more than the
  * last factor of buffer compactness, KMV is the right primitive. The
  * two coexist: `approx_count_distinct` remains the one-liner when no
  * cross-engine replay is required.
  *
  * K-minimum-values (Bar-Yossef et al. 2002): hash every value into
  * [0, M), keep the k smallest DISTINCT hashes; if the k-th smallest is
  * h_k, the distinct count is ≈ (k-1) * M / h_k (the k-th order
  * statistic of n uniform draws sits near k*M/n). Relative error
  * ~ 1/sqrt(k-2). Duplicates collapse by construction — identical
  * values hash identically and the buffer is a set.
  *
  * Scale shape: ONE shuffle on the group key; the aggregation buffer is
  * a bounded sorted array of ≤ k longs, merged map-side like any
  * partial aggregate, so shuffle bytes per group per partition are
  * ≤ 8k regardless of input volume — the property that makes distinct
  * counting viable at 100 TB, where exact per-group distinct counts
  * would shuffle every distinct value.
  */
object SketchOps {

  /** Portable value hash: ((v mod m + m) * a + b) mod m, exact long math
    * end-to-end, replayable in SQL as
    * `((v % 999999937 + 999999937) * 123456791 + 7919) % 999999937`.
    *
    * The pre-reduction keeps (v mod m + m) ≤ 2m, so the product is
    * ≤ 2m·a ≈ 2.5e17 < 2^63 for EVERY long v — no overflow divergence
    * between engines, and negatives land in [0, m) too. The multiplier
    * must be large relative to m / |value range|: an early version used
    * a = 1048573, and for ids ≤ 1500 the product never wrapped past m —
    * hashes came out monotonic in v instead of equidistributed, and the
    * KMV order-statistic estimator read 150 distinct users as ~950
    * (the k-th smallest hash sits where uniformity puts it, and an
    * unwrapped affine map is maximally non-uniform). With a ≈ m/8 the
    * map wraps every few consecutive ids and Weyl equidistribution does
    * the rest. Value sets aligned to multiples of ~m/a remain a known
    * weakness of any affine-mod-prime mix — if ids can be adversarial,
    * hash first with a cryptographic column (md5 prefix) and accept the
    * ~10x per-row cost; for sampling/sketching over organic keys the
    * arithmetic form is the right default.
    *
    * Collisions (values congruent mod m) under-count distincts
    * identically in both engines — that bias is part of the
    * (deterministic) estimator. */
  val hashM: Long = 999999937L
  def portableHash(v: Column, a: Long = 123456791L, b: Long = 7919L): Column =
    ((v.cast("long") % hashM + hashM) * a + b) % hashM

  /** Bounded k-minimum-distinct-values buffer: a sorted Array[Long] of at
    * most k entries. Insert = binary search (reject duplicates, reject
    * anything ≥ current max when full); merge = sorted-array merge
    * truncated at k. Both are order-independent, so the final buffer —
    * and the estimate — is deterministic under any partitioning. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], (Long, Long)] {
    require(k >= 3, "k must be >= 3 (estimator uses k-1 and needs slack)")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // duplicate hash: a set, not a bag
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // not smaller than current max
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // same hash on both sides
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    /** (number of retained hashes, k-th smallest hash or hashM if the
      * buffer never filled — in which case the retained count IS the
      * exact distinct-hash count and the caller uses it directly). */
    override def finish(buf: Array[Long]): (Long, Long) =
      if (buf.length < k) (buf.length.toLong, hashM)
      else (k.toLong, buf(k - 1))

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  }

  /** Per-group distinct-count estimate of `valueCol` (integral) via KMV
    * with the portable hash. Output: groupCols ++ (n_kept, kth_hash,
    * est_distinct). When a group has fewer than k distinct hashes the
    * estimate is exact (= n_kept). The estimate is floor math end-to-end
    * so the oracle compares as BIGINT, no float rounding seam. */
  def kmvDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: Column,
      k: Int): DataFrame = {
    val agg = udaf(new KmvAgg(k))
    // COUNT(DISTINCT)-style null policy: null values are not distinct
    // values. (A group consisting ONLY of null values disappears rather
    // than reporting 0 — filter upstream if that distinction matters.)
    df.filter(valueCol.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(portableHash(valueCol)).as("__kmv"))
      .select(groupCols.map(col) :+
        col("__kmv._1").as("n_kept") :+
        col("__kmv._2").as("kth_hash") :+
        when(col("__kmv._1") < k, col("__kmv._1"))
          .otherwise(expr(s"${(k - 1).toLong * hashM} div `__kmv`.`_2`"))
          .cast("long").as("est_distinct"): _*)
  }
}
