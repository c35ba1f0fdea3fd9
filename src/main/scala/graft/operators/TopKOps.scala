package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact per-group top-k by a value column via a BOUNDED aggregation
  * buffer — the scale-right shape for "k best rows per group".
  *
  * The window formulation (`row_number() over (partition by g order by v
  * desc)` then `rn <= k`) shuffles and SORTS every row of every group to
  * keep k of them; at corpus scale the sort dominates and the discarded
  * (n - k) rows still crossed the network. This aggregator keeps a
  * sorted ≤ k-entry buffer, so map-side partial aggregation reduces each
  * partition's contribution to k rows per group BEFORE the shuffle —
  * shuffle bytes are O(groups × k × partitions-with-group) and nothing
  * is ever globally sorted. Insert and merge are order-independent, so
  * the result is deterministic under any partitioning (ties broken by
  * the tie column, which the caller must make unique per group).
  *
  * Same portable-summary family as SketchOps.KmvAgg: bounded buffer,
  * order-independent merge, result replayable as plain window SQL by
  * the oracle — but exact, not an estimate, because top-k-by-value
  * (unlike top-k-by-aggregated-count) needs no global pass.
  */
object TopKOps {

  /** Buffer entry: (orderVal, tieVal); ranked by orderVal DESC then
    * tieVal ASC. Flat Array[Long] of 2k slots max keeps the codec
    * trivial (pairs at [2i], [2i+1]). */
  final class TopKAgg(k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(k >= 1, "k must be >= 1")

    override def zero: Array[Long] = Array.emptyLongArray

    // true if (v1,t1) ranks strictly ahead of (v2,t2)
    private def ahead(v1: Long, t1: Long, v2: Long, t2: Long): Boolean =
      v1 > v2 || (v1 == v2 && t1 < t2)

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val n = buf.length / 2
      if (n == k && !ahead(in._1, in._2, buf(2 * k - 2), buf(2 * k - 1))) buf
      else {
        // insertion position by rank
        var i = 0
        while (i < n && ahead(buf(2 * i), buf(2 * i + 1), in._1, in._2)) i += 1
        val outN = math.min(n + 1, k)
        val out = new Array[Long](outN * 2)
        System.arraycopy(buf, 0, out, 0, 2 * i)
        out(2 * i) = in._1
        out(2 * i + 1) = in._2
        System.arraycopy(buf, 2 * i, out, 2 * i + 2,
          math.max(0, outN * 2 - (2 * i + 2)))
        out
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val outN = math.min((a.length + b.length) / 2, k)
      val out = new Array[Long](outN * 2)
      var i = 0; var j = 0; var n = 0
      while (n < outN) {
        val takeA = j >= b.length ||
          (i < a.length && ahead(a(i), a(i + 1), b(j), b(j + 1)))
        if (takeA) { out(2 * n) = a(i); out(2 * n + 1) = a(i + 1); i += 2 }
        else { out(2 * n) = b(j); out(2 * n + 1) = b(j + 1); j += 2 }
        n += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Top-k rows per group by `orderCol` descending, ties by `tieCol`
    * ascending (make it unique per group for a deterministic result).
    * Output: groupCols ++ (rank [1-based int], orderCol, tieCol) — one
    * row per kept entry, ranked. Null orderCol/tieCol rows are dropped
    * (a null has no defined rank; pre-coalesce to keep them). */
  def topKByValue(
      df: DataFrame, groupCols: Seq[String],
      orderCol: Column, tieCol: Column, k: Int,
      orderName: String = "order_val", tieName: String = "tie_val"): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    // re-pair the flat buffer row-locally (no second shuffle): entry i is
    // (buf[2i], buf[2i+1]), already in rank order
    val pairs = expr(
      "transform(sequence(0, size(__topk) div 2 - 1), " +
        "i -> struct(__topk[i*2] AS o, __topk[i*2+1] AS t))")
    df.filter(orderCol.isNotNull && tieCol.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(orderCol.cast("long"), tieCol.cast("long")).as("__topk"))
      .filter(size(col("__topk")) > 0)
      .select(groupCols.map(col) :+ posexplode(pairs).as(Seq("__pos", "__p")): _*)
      .select(groupCols.map(col) :+
        (col("__pos") + 1).cast("int").as("rank") :+
        col("__p.o").as(orderName) :+ col("__p.t").as(tieName): _*)
  }

  /** [[topKByValue]] for a real-valued (DOUBLE) score: the score is
    * routed through the order-preserving `sortable_bits` key (see
    * [[graft.functions.SortableBitsExpr]] — ties, -0.0 and NaN order
    * exactly as the engines' `ORDER BY score DESC` would), so ranking
    * by cosine/probability scores gets the same bounded map-side
    * aggregation instead of the window sort. The encoded key is
    * meaningless to callers and is dropped: output = groupCols ++
    * (rank, tieName). Rows with a null score or tie are dropped, same
    * as [[topKByValue]]. */
  def topKByScore(
      df: DataFrame, groupCols: Seq[String],
      scoreCol: Column, tieCol: Column, k: Int,
      tieName: String = "tie_val"): DataFrame =
    topKByValue(df, groupCols,
        call_function("sortable_bits", scoreCol.cast("double")), tieCol, k,
        orderName = "__score_bits", tieName = tieName)
      .drop("__score_bits")
}
