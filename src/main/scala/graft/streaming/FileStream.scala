package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.10): the reference is
  * batch-only but has incremental arrive-and-process structure (each
  * stage consumes the files the previous stage produced, re-runs skip
  * existing outputs). The idiomatic Spark mapping is the file source
  * with `Trigger.AvailableNow` + checkpointed, idempotent sinks: a
  * re-run processes only files not yet recorded in the checkpoint —
  * exactly the reference's existence-check semantics, but transactional.
  */
object FileStream {

  /** Incremental parquet stage: stream `transform(source)` into a parquet
    * directory, processing only not-yet-seen files, then return. */
  def runStageAvailableNow(
      spark: SparkSession, srcGlob: String, schema: StructType,
      transform: DataFrame => DataFrame,
      outPath: String, checkpoint: String): Unit = {
    val in = spark.readStream.schema(schema).parquet(srcGlob)
    val q = transform(in).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup: keep the first row per canonical-text
    * fingerprint (the streaming form of DedupOps.exactDedup) over an
    * unbounded document stream. `dropDuplicatesWithinWatermark` keys
    * state on the 128-bit fingerprint and evicts an entry once the
    * watermark passes the event time it was recorded at — plain
    * `dropDuplicates` would only evict when the event-time column is
    * itself a dedup key, so its state grows with the corpus and OOMs on
    * an unbounded stream. Memory therefore scales with the dedup
    * horizon, not the corpus; a duplicate arriving after its original
    * aged out is re-emitted. That horizon/exactness trade is the price
    * of unbounded input, and the watermark is the knob. */
  def streamingExactDedup(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("fingerprint", graft.functions.TextFns.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Gap-based sessionization on an unbounded stream: the SAME
    * session_window groupBy as the batch w6 query, plus a watermark so
    * the engine can close (and emit, in append mode) a session once no
    * in-horizon event can extend it, reclaiming its state. Session state
    * is per open session, not per event — the property that keeps this
    * viable on an unbounded stream. */
  def sessionizedEventStats(
      events: DataFrame, tsCol: String, userCol: String,
      gap: String, watermark: String,
      valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(25,10)")).cast("double").as("sum_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** CDC-style streaming upsert: each micro-batch MERGEs into a parquet
    * base table via foreachBatch — the streaming composition of
    * MergeOps.upsert (reference semantics: later metadata snapshots
    * overwrite earlier rows, new keys append). Each batch rewrites the
    * base ONCE through the broadcast-safe merge plan (updates are the
    * small side), and the read-modify-write is serialized by the
    * streaming engine — foreachBatch is the idiomatic seam for sinks
    * Spark cannot transactionally MERGE into natively. The batch is
    * deduplicated to the last row per key (batch order is
    * last-writer-wins within a micro-batch, keyed by `orderCol`). */
  def streamingUpsert(
      updates: DataFrame, basePath: String, keys: Seq[String],
      updateCols: Seq[String], orderCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
        val keyed = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged = graft.operators.MergeOps.upsert(
          spark.read.parquet(basePath), keyed, keys, updateCols,
          broadcastUpdates = true)
        // write-then-swap: parquet cannot be read and overwritten in one
        // job, so materialize to a temp dir and repoint. Hadoop
        // FileSystem (not java.io.File) so the swap works on whatever
        // store basePath lives on, not just the driver's local disk.
        val tmp = basePath + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        // Hadoop rename/delete signal failure by RETURNING FALSE — an
        // unchecked false first rename would make the second rename
        // nest the new data INSIDE the still-existing base and silently
        // drop the merge. Checked failures throw, which fails the batch
        // and lets the streaming engine retry it; a crash between the
        // renames leaves the merged data at `.next` and the previous
        // base at `.old` for manual repoint (plain file stores have no
        // atomic two-dir swap — a table format is the transactional
        // answer; this is the best a bare directory can do).
        val baseP = new org.apache.hadoop.fs.Path(basePath)
        val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bakP = new org.apache.hadoop.fs.Path(basePath + ".old")
        if (fs.exists(bakP)) require(fs.delete(bakP, true), s"cannot clear $bakP")
        require(fs.rename(baseP, bakP), s"cannot park $baseP at $bakP")
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp), baseP),
          s"cannot move $tmp to $baseP — previous base preserved at $bakP")
        ()
      }
      .start()

  /** Event-time windowed counts with a watermark — the streaming-native
    * shape of the reference's per-stage success/fail counters (§2.4 A5).
    * Late rows beyond the watermark are dropped by the engine; state for
    * closed windows is reclaimed, which is what keeps this viable on an
    * unbounded stream. */
  def windowedEventCounts(
      events: DataFrame, tsCol: String, typeCol: String,
      window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"))
}
