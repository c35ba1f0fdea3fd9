package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to every left row the latest right row
  * with `right.time <= left.time` on the same key — the standard way a
  * training-data pipeline stamps events with the most recent preceding
  * state (last QC result, last model score, last metadata snapshot).
  *
  * Spark has no native as-of join, and the naive encoding — an
  * inequality join + per-pair ranking — is a range cross-product that
  * explodes quadratically within hot keys. The scale shape used here:
  *
  *   1. tag right rows 0 and left rows 1, union them into one stream of
  *      (key, time, side, payload) rows;
  *   2. one window over (partitionBy key, orderBy time, side) takes the
  *      running `last(payload, ignoreNulls=true)` — at each left row
  *      that is exactly the latest right payload at-or-before its time
  *      (side 0 sorts before 1, so an equal-time right row IS visible:
  *      <= semantics, matching an inclusive-inequality ASOF join);
  *   3. keep side-1 rows, flatten the matched payload.
  *
  * Cost: ONE shuffle+sort of |L|+|R| rows on the key — the same shape as
  * a regular co-partitioned join, regardless of time skew. No pair ever
  * materializes.
  *
  * Right must be unique per (key, time) — pre-aggregate it if not
  * (ambiguous otherwise in ANY engine). Rows with a null key or time
  * should be filtered first: SQL inequality semantics never match NULL,
  * while a window would group null keys together.
  */
object AsofOps {

  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, payloadCols: Seq[String]): DataFrame = {
    // The output is left.* ++ payloadCols by name; a payload name colliding
    // with a left column would emit a silently duplicated column that breaks
    // later by-name references, so reject it up front.
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")} — rename on one side first")
    val r = right.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      struct(payloadCols.map(col): _*).as("__p"))
    val l = left.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"))
    val lTagged = l
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .withColumn("__side", lit(1))
    val rTagged = r
      .withColumn("__l", lit(null).cast(l.schema("__l").dataType))
      .withColumn("__side", lit(0))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged.select(lTagged.columns.toIndexedSeq.map(col): _*))
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
