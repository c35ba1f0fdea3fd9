package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared same-JVM A/B harness for the dev probes (r13 review: the
  * job-count listener, cooldown, noop-write timer, and order-insensitive
  * checksum were triplicating across Profile* mains — a harness fix
  * must land once, not per probe).
  *
  * Discipline encoded here (see Bench.scala scaladoc): alternating
  * GC-separated reps in ONE JVM are the only valid perf comparison on
  * this host; results are checksummed so a faster-but-wrong variant
  * cannot win a bake-off.
  */
final class ProbeHarness(spark: SparkSession, tag: String) {
  private val jobCount = new java.util.concurrent.atomic.AtomicInteger
  spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobCount.incrementAndGet(); ()
    }
  })

  def cooldown(): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(100)
  }

  /** Time one full materialization (noop sink) after a cooldown; prints
    * wall seconds and the driver-job count the run cost. */
  def time(label: String)(f: => DataFrame): Double = {
    cooldown()
    val j0 = jobCount.get()
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[$tag] $label%-16s $dt%6.3f s  jobs=${jobCount.get() - j0}")
    dt
  }

  /** Order-insensitive value checksum (mod keeps the ANSI sum inside
    * BIGINT for any realistic row count). */
  def sig(df: DataFrame): Long =
    df.select((xxhash64(df.columns.toIndexedSeq.map(col): _*) % 1000000007L).as("h"))
      .agg(sum("h")).head().getLong(0)

  /** Assert every variant's result equals the baseline's. */
  def parity(baseline: Long, variants: Seq[(String, () => DataFrame)]): Unit =
    variants.foreach { case (label, b) =>
      val s = sig(b())
      println(s"[$tag] parity $label ${
        if (s == baseline) "OK" else s"MISMATCH ($s vs $baseline)"}")
      require(s == baseline, s"$label parity")
    }
}
