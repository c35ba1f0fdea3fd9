package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketing must actually remove the join shuffle — the plan assertion
  * is the point, not the row count. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucket tables sort-merge-join with zero Exchange") {
    val sfDir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    // a fresh in-memory catalog does not know about a previous JVM's
    // managed-table locations — clear both catalog entry and directory
    for (t <- Seq("bkt_orders", "bkt_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
    }
    BucketedTables.writeBucketed(orders, "bkt_orders", Seq("o_orderkey"), 8)
    BucketedTables.writeBucketed(lineitem, "bkt_lineitem", Seq("o_orderkey"), 8)

    // force SMJ so a broadcast plan can't mask a missing shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = BucketedTables.cogroupJoin(
        spark, "bkt_orders", "bkt_lineitem", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(800))
      // and it is still the right join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected && expected > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
