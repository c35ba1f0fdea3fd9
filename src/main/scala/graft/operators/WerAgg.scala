package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Corpus WER aggregator: Σ word-level edit distance / Σ reference words,
  * ×100 — jiwer's corpus semantics (NOT mean of per-utterance WERs; SURVEY
  * §2.4 A8, reference alignment/whisper_qc.py:322-329). Distributed as a
  * classic partial-aggregate: the buffer is just two longs, so map-side
  * combine keeps shuffle traffic at 16 bytes per group per partition
  * regardless of text volume — this is what makes it viable at 100 TB.
  */
object WerAgg extends Aggregator[(String, String), (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (String, String)): (Long, Long) = {
    val ref = tokenize(in._1)
    val hyp = tokenize(in._2)
    (b._1 + levenshtein(ref, hyp), b._2 + ref.length)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) 0.0 else 100.0 * b._1 / b._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  private def tokenize(s: String): Array[String] =
    if (s == null) Array.empty
    else {
      val t = s.trim
      if (t.isEmpty) Array.empty else t.split("\\s+")
    }

  /** Word-level Levenshtein, two-row DP (O(min(m,n)) memory). */
  def levenshtein(a: Array[String], b: Array[String]): Long = {
    if (a.isEmpty) return b.length.toLong
    if (b.isEmpty) return a.length.toLong
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(_.toLong)
    var cur = new Array[Long](s.length + 1)
    var j = 1
    while (j <= t.length) {
      cur(0) = j.toLong
      var i = 1
      while (i <= s.length) {
        val cost = if (s(i - 1) == t(j - 1)) 0L else 1L
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(s.length)
  }

  /** SQL/DataFrame-facing UDAF: corpus_wer(ref, hyp). */
  val asUdaf = udaf(WerAgg)
}
