package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert / MERGE INTO as a plain-Spark composition (no Delta required):
  * WHEN MATCHED UPDATE the given columns, WHEN NOT MATCHED INSERT. SURVEY
  * §2.3 J3 (reference pre_processing/process_all.py:797-839).
  *
  * Shape: one shuffle on the merge key (a full outer join). At scale, if
  * `updates` is small relative to `base` (the common metadata-upsert case),
  * Catalyst/AQE will broadcast it and the base table is never shuffled.
  */
object MergeOps {

  /** @param base       existing table
    * @param updates    new rows; must contain `keys` and `updateCols`
    * @param keys       equality merge key column names
    * @param updateCols columns taken from `updates` when matched (and used
    *                   for inserts); any base column absent from `updates`
    *                   is null on inserted rows unless given in `insertDefaults`
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      updateCols: Seq[String],
      insertDefaults: Map[String, org.apache.spark.sql.Column] = Map.empty)
      : DataFrame = {
    val b = base.alias("b")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _)
    val joined = b.join(u, cond, "full_outer")
    val outCols = base.columns.map { c =>
      if (keys.contains(c))
        coalesce(col(s"b.$c"), col(s"u.$c")).as(c)
      else if (updateCols.contains(c)) {
        val updated = coalesce(col(s"u.$c"), col(s"b.$c"))
        insertDefaults.get(c) match {
          case Some(d) => coalesce(updated, d).as(c)
          case None    => updated.as(c)
        }
      } else insertDefaults.get(c) match {
        case Some(d) => coalesce(col(s"b.$c"), d).as(c)
        case None    => col(s"b.$c").as(c)
      }
    }
    joined.select(outCols.toIndexedSeq: _*)
  }
}
