package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W3 ★ — stateful sentence regrouping (SURVEY §2.5; reference
  * pre_processing/process_all.py:305-335): walk a book's sentences in
  * order accumulating a word count; once the accumulator reaches
  * `threshold` the current group is emitted and the accumulator resets.
  * The final partial group is kept iff its word count >= threshold / 2
  * (integer division — the reference's `//2` tail rule).
  *
  * This is an order-dependent fold with a reset, NOT a frame-based window
  * aggregate — expressed as `groupByKey(doc).flatMapGroups` over the
  * sorted sentence iterator (the idiomatic Spark shape for per-key
  * sequential state). One shuffle on the doc key; state per task is one
  * group's sentences, not the whole doc.
  *
  * The group key is the doc column's own value (compared via its string
  * form), NOT a 32-bit hash of it — at corpus scale a hash-keyed regroup
  * silently interleaves colliding docs into one fold. The output `doc_id`
  * keeps the input column's native type.
  */
object RegroupOps {

  /** @param df        rows of (docCol: any keyable type, ordCol: numeric,
    *                  sentCol: string, wcCol: numeric) — one sentence per row
    * @param threshold emit a group once accumulated word count >= threshold
    */
  def regroupSentences(
      df: DataFrame, docCol: String, ordCol: String, sentCol: String,
      wcCol: String, threshold: Int): DataFrame = {
    val docType = df.schema(docCol).dataType
    val outSchema = StructType(Seq(
      StructField("doc_id", docType),
      StructField("grp_idx", IntegerType),
      StructField("grp_text", StringType),
      StructField("grp_wc", LongType)))
    val in = df.select(
      col(docCol), col(ordCol).cast("long"),
      col(sentCol).cast("string"), col(wcCol).cast("long"))
    in.groupByKey(r => if (r.isNullAt(0)) null else r.get(0).toString)(
        Encoders.STRING)
      .flatMapGroups { (_, it: Iterator[Row]) =>
        val sorted = it.toArray.sortBy(_.getLong(1))
        val doc = sorted.head.get(0)
        val out = Seq.newBuilder[Row]
        var grp = List.empty[String]
        var accWc = 0L
        var gi = 0
        sorted.foreach { r =>
          grp = r.getString(2) :: grp
          accWc += r.getLong(3)
          if (accWc >= threshold) {
            out += Row(doc, gi, grp.reverse.mkString(" "), accWc)
            gi += 1; grp = Nil; accWc = 0L
          }
        }
        // tail rule: keep the partial final group iff wc >= threshold // 2
        if (grp.nonEmpty && accWc >= threshold / 2)
          out += Row(doc, gi, grp.reverse.mkString(" "), accWc)
        out.result()
      }(Encoders.row(outSchema))
  }
}
