package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: map a corpus of variable-length documents onto
  * fixed-token-budget training sequences (the concat-and-chunk layout every
  * large-model data pipeline performs before tokenized examples reach the
  * trainer — docs are concatenated in a deterministic order and the stream
  * is cut every `budget` tokens, so a document may span a sequence
  * boundary).
  *
  * Beyond-reference operator (SURVEY §2.11); the reference's closest
  * analogue is the sentence-regroup fold (pre_processing/process_all.py:
  * 285-303), which packs *sentences* to a word budget sequentially. That
  * fold is order-dependent per group; concat-and-chunk is instead pure
  * prefix arithmetic, which is what makes it embarrassingly parallel.
  *
  * Scale shape: ONE shuffle — the window over `shardCol`. The cumulative
  * token sum is per shard, so shards (not the corpus) bound the window's
  * sort; pick the shard column so one shard's docs fit a partition (a
  * 100 TB corpus with hash(doc) % 100k shards gives ~1 GB shards). Packing
  * is per-shard independent by construction — sequence ids are
  * (shard, seq_in_shard) pairs, never a global counter, so no shard ever
  * waits on another and adding data to one shard re-packs only that shard.
  */
object PackOps {

  /** Assign each document its span of fixed-size sequences.
    *
    * Output columns (input columns are kept):
    *  - `n_tok`      — the document's token count (from `tokCol`)
    *  - `tok_start`  — the doc's first token's offset in the shard stream
    *  - `seq_first`  — id (within shard) of the first sequence it occupies
    *  - `seq_offset` — offset of the doc's first token inside `seq_first`
    *  - `seq_last`   — id of the last sequence it occupies
    *  - `n_seqs`     — how many sequences the doc spans
    *
    * Docs with a non-positive token count occupy no slot and are dropped
    * (an empty doc has no tokens to pack; keeping it would make
    * `seq_last = seq_first - 1` nonsense rows).
    *
    * `orderCols` must be a deterministic total order within a shard —
    * packing is defined BY that order, and the oracle replays it.
    */
  def packSequences(
      df: DataFrame, shardCol: String, orderCols: Seq[String],
      tokCol: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokCol.cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("tok_start", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_first", expr(s"tok_start div $budget"))
      .withColumn("seq_offset", col("tok_start") % budget)
      .withColumn("seq_last", expr(s"(tok_start + n_tok - 1) div $budget"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1L)
  }

  /** Sliding-window token chunking with overlap — the retrieval/context-
    * window counterpart to packSequences: instead of cutting a
    * concatenated stream at exact budgets, each DOCUMENT is split into
    * `size`-token chunks whose starts advance by `stride` (< size ⇒
    * overlapping chunks, the standard RAG/window layout). Entirely
    * row-local (tokenize, enumerate starts, slice — no shuffle at all);
    * the fan-out is ceil(n/stride) rows per doc. `tokArrayCol` must
    * evaluate to an array of token strings.
    *
    * Output per chunk: chunk_idx (0-based), tok_start, n_tok (= size
    * except at the tail), chunk (space-joined tokens). Docs with zero
    * tokens emit nothing.
    */
  def chunkOverlap(
      df: DataFrame, tokArrayCol: Column, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (stride > size would skip tokens)")
    df.withColumn("__toks", tokArrayCol)
      .filter(size_(col("__toks")) > 0)
      .select(df.columns.toIndexedSeq.map(col) :+ posexplode(expr(
        s"""transform(sequence(0, size(__toks) - 1, $stride),
           |  s -> struct(
           |    CAST(s AS BIGINT) AS tok_start,
           |    size(slice(__toks, s + 1, $size)) AS n_tok,
           |    array_join(slice(__toks, s + 1, $size), ' ') AS chunk))"""
          .stripMargin)).as(Seq("__pos", "__c")): _*)
      .select(df.columns.toIndexedSeq.map(col) :+
        col("__pos").cast("int").as("chunk_idx") :+
        col("__c.tok_start") :+ col("__c.n_tok") :+ col("__c.chunk"): _*)
  }

  // scala.Predef-vs-functions disambiguation for functions.size
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
