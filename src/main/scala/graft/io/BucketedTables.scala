package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables for co-located joins (SURVEY §6 / the brief's
  * "repartition/bucketing for co-located joins"): two tables bucketed and
  * sorted on the same key with the same bucket count sort-merge-join
  * WITHOUT a shuffle — on a repeatedly-joined 100 TB fact table, writing
  * it bucketed once converts every subsequent join's full shuffle into a
  * local per-bucket merge. This is the persisted complement to the
  * broadcast/AQE strategies used elsewhere in the engine.
  *
  * Works with the in-memory catalog + a spark.sql.warehouse.dir — no Hive
  * metastore needed. `BucketedJoinSpec` asserts the shuffle-free plan.
  */
object BucketedTables {

  /** Write `df` as a parquet managed table bucketed AND sorted by `keys`.
    * Sorting within buckets lets the join skip its sort as well. */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Inner equi-join of two same-bucketing tables on their bucket keys.
    * With matching bucket specs Spark plans SortMergeJoin over the bucket
    * files directly — zero Exchange operators on either side. */
  def cogroupJoin(
      spark: SparkSession, tableA: String, tableB: String,
      keys: Seq[String]): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keys)
}
