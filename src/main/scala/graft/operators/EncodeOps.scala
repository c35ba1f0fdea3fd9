package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary / label encoding (SURVEY §2.4 A9; reference push_to_hf.py:22
  * `class_encode_column`).
  *
  * Scale shape: a naive `dense_rank().over(Window.orderBy(col))` would pull
  * the WHOLE table through one partition (a non-partitioned window). Instead
  * the dictionary — the distinct value set, small by definition for a label
  * column — is built first (one shuffle over values only), numbered on the
  * driver-side-small result with a 1-partition window, and broadcast-joined
  * back. The 100 TB fact table is never shuffled.
  */
object EncodeOps {
  def dictEncode(df: DataFrame, column: String, labelCol: String): DataFrame = {
    val dict = df.select(col(column)).distinct()
      .withColumn(labelCol,
        row_number().over(Window.orderBy(col(column))).cast("bigint"))
    df.join(broadcast(dict), Seq(column))
  }
}
