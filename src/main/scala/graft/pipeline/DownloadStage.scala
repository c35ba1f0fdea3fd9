package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** S16 — the chunked-stream download sink (reference
  * crawler/download.py:62-117): per-task fetch with bounded retries and
  * exponential backoff (F17), chunked writes, and a success/fail summary
  * with rates (F18, download.py:249-259,315).
  *
  * Spark shape: `mapPartitions` with ONE client per partition (the
  * reference's `Semaphore(DOWNLOAD_BOOK_LIMIT)` becomes the partition
  * count), side-effect file writes executor-local, and a plain DataFrame
  * of status rows coming back — so the driver aggregates outcomes
  * relationally instead of mutating counters. Retries stay INSIDE the
  * operator: a task failure is data (ok=false), never a Spark task
  * failure, so one dead URL can't fail a 100 TB stage.
  */
object DownloadStage {

  /** Transport boundary; production binds an HTTP client per partition,
    * tests bind deterministic/flaky stubs. Returns the payload bytes. */
  trait Fetcher extends Serializable {
    def fetch(url: String): Array[Byte]
    /** Backoff hook — overridable so tests don't sleep (F17: 2^retry s). */
    def backoff(retry: Int): Unit = Thread.sleep((1L << retry) * 1000)
  }

  final case class FetchStatus(
    url: String, dest: String, ok: Boolean, attempts: Int, n_bytes: Long,
    error: String)

  /** @param tasks   rows of (url, dest) — compose via U3/J8 upstream
    * @param maxRetries attempts = maxRetries + 1 (reference retry=3)
    * @param parallelism partition count = the reference's semaphore budget
    */
  def run(tasks: DataFrame, fetcher: Fetcher, maxRetries: Int = 3,
      parallelism: Int = 10, chunkBytes: Int = 8192): DataFrame = {
    val in = tasks.select(col("url").cast("string"), col("dest").cast("string"))
      .repartition(parallelism)
    in.mapPartitions { rows =>
      rows.map { r =>
        val (url, dest) = (r.getString(0), r.getString(1))
        var attempt = 0
        var result: FetchStatus = null
        while (result == null || (!result.ok && attempt <= maxRetries)) {
          if (attempt > 0) fetcher.backoff(attempt - 1)
          result =
            try {
              val bytes = fetcher.fetch(url)
              val p = Paths.get(dest)
              Files.createDirectories(p.getParent)
              // chunked write (8 KB default, download.py:89-93)
              val out = Files.newOutputStream(p)
              try {
                var off = 0
                while (off < bytes.length) {
                  val n = math.min(chunkBytes, bytes.length - off)
                  out.write(bytes, off, n); off += n
                }
              } finally out.close()
              FetchStatus(url, dest, ok = true, attempt + 1, bytes.length.toLong, "")
            } catch {
              case e: Exception =>
                FetchStatus(url, dest, ok = false, attempt + 1, 0L,
                  String.valueOf(e.getMessage))
            }
          attempt += 1
        }
        result
      }
    }(Encoders.product[FetchStatus]).toDF()
  }

  /** F18: success/fail counts + rate (download.py:249-259,315). */
  def summarize(status: DataFrame): DataFrame =
    status.agg(
      count(when(col("ok"), 1)).as("n_ok"),
      count(when(!col("ok"), 1)).as("n_failed"),
      count(lit(1)).as("n_total"),
      // greatest(…,1): an empty task set is 0% success, not a
      // divide-by-zero (ANSI mode errors on 0/0)
      (count(when(col("ok"), 1)) * 100.0 / greatest(count(lit(1)), lit(1L)))
        .as("success_rate"),
      sum(col("n_bytes")).as("total_bytes"))
}
