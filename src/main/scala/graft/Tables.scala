package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that scale-sensitive read options
  * live in one place. Tables are plain parquet directories/files named
  * `<table>.parquet` under a scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a NARROW scan out to the session's parallelism — for kernel-
    * heavy per-row stages (tokenize, rolling hash, vector math) whose
    * map work would otherwise serialize on however few splits the input
    * file has. The local fixtures are single-row-group parquet, so their
    * scans are 1 task and a 46 µs/row kernel over 150k rows burns 7 s of
    * ONE core on a 32-core session (round-8 bench finding, see
    * fn_normalize_pipeline). Widen-only: at real scale the scan already
    * carries >= parallelism splits and this is the identity — it never
    * narrows, so it can never concentrate a 100 TB scan. Explicit
    * numPartitions keeps AQE from coalescing the tiny exchange away.
    * Apply ONLY where the per-row kernel dominates the stage — a fanned
    * exchange on a scan-light query is pure overhead. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** events.parquet carries TIMESTAMP(NANOS) which Spark cannot represent
    * (TimestampType is microseconds). We read the raw int64 nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`, set in [[Sessions.builder]]) and
    * expose both the exact nanos (`ts_ns`) and a microsecond-truncated
    * TimestampType `ts` — the same truncation DuckDB 1.x applies when it
    * coerces TIMESTAMP_NS to its microsecond TIMESTAMP, so oracle
    * comparisons on `ts` are exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division (`div`), NOT `/`: Spark's `/` on longs goes
        // through double, and epoch nanos (~1.7e18) exceed double's 2^53
        // exact range — ~12% of rows would come back 1 µs off. Testdata
        // timestamps are post-epoch, so truncation == floor here.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Newer fixtures write TIMESTAMP micros with isAdjustedToUTC=false,
        // which Spark reads as TIMESTAMP_NTZ. The session timezone is pinned
        // to UTC (Sessions.builder), so casting NTZ -> TIMESTAMP is
        // value-identical, and matches how DuckDB reads the same file.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /** Register all tables as temp views so every operator is SQL-addressable.
    *
    * Per-table isolation (round-6 postmortem): registerAll used to run
    * OUTSIDE the harness mains' per-query try, so ONE unreadable table —
    * the regenerated events.parquet switching to TIMESTAMP_NTZ — aborted
    * the entire Bench/Verify startup and zeroed the round's artifacts.
    * A table that fails to register now logs and is skipped; only the
    * queries touching it fail, and they fail visibly per-query.
    *
    * Returns the names that FAILED to register so the harness mains can
    * surface them in their JSON artifacts — automation that reads only
    * the artifacts (not stderr) must still see that a table was skipped
    * (round-7 advice). */
  def registerAll(spark: SparkSession, dir: String): Seq[String] = {
    def tryRegister(n: String)(mk: => DataFrame): Option[String] =
      try { mk.createOrReplaceTempView(n); None }
      catch { case scala.util.control.NonFatal(e) =>
        // Drop any stale same-name view from a previous registration:
        // keeping it would silently serve the OLD fixture's data where
        // the doc promises a visible per-query failure.
        spark.catalog.dropTempView(n)
        System.err.println(s"[tables] $n failed to register: ${e.getMessage}")
        Some(n)
      }
    names.filterNot(_ == "events")
      .flatMap(n => tryRegister(n)(load(spark, dir, n))) ++
      tryRegister("events")(events(spark, dir))
  }
}

/** One place for session tuning shared by Verify / Bench / tests. */
object Sessions {
  private val defaultCpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)

  def builder(master: String = s"local[$defaultCpus]"): SparkSession.Builder = {
    val cpus = defaultCpus
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its default (true). The r9 probe set
      // it false to chase per-task overhead on the many small queries:
      // the small queries did NOT speed up and the CPU-dense g2
      // triangle intersect collapsed to one 64MB-advisory task
      // (5.2 -> 19.6 s). Byte-size advisories cannot see CPU density;
      // keep scheduling width tied to cores.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // F19 dict-merge semantics: {**a, **b} keeps the LAST value for a
      // duplicate key (reference process_all.py:816); Spark's default
      // map_concat policy is EXCEPTION.
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Reliable-mode checkpoints are durable FILES: without this the
      // ContextCleaner never deletes superseded ones, so a long
      // iterative loop (one checkpoint per round) or a streaming job
      // (one per batch) grows the checkpoint volume without bound.
      // With it, a checkpoint's files go when its RDD becomes
      // unreachable on the driver — bounding the dir to the live
      // working set (see Checkpoints' scaladoc; deployers embedding
      // the library in their own session must set this themselves).
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
  }
}
