package graft

import org.apache.spark.sql.GraftBenchShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** stripRootSort is bench-only plan surgery — it must strip EXACTLY a
  * global Sort at the root, preserve the row multiset, and never touch
  * interior sorts (which are operator semantics, e.g. windows or ordered
  * collects). */
class BenchShimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("root orderBy is stripped; row multiset identical") {
    val df = Seq((3, "c"), (1, "a"), (2, "b"), (1, "z")).toDF("k", "v")
    val sorted = df.orderBy("k", "v")
    val stripped = GraftBenchShim.stripRootSort(sorted)
    assert(!stripped.queryExecution.executedPlan.toString.contains("Sort"))
    assert(stripped.count() == 4)
    assert(stripped.exceptAll(sorted).isEmpty && sorted.exceptAll(stripped).isEmpty)
  }

  test("plans without a root sort pass through untouched") {
    val df = Seq((1, "a")).toDF("k", "v").filter(col("k") > 0)
    assert(GraftBenchShim.stripRootSort(df) eq df)
  }

  test("interior sorts survive (sortWithinPartitions, window order)") {
    val within = Seq((2, "b"), (1, "a")).toDF("k", "v").sortWithinPartitions("k")
    // a partition-local sort is not a global Sort root: untouched
    assert(GraftBenchShim.stripRootSort(within) eq within)
    import org.apache.spark.sql.expressions.Window
    val win = Seq((1, 10), (1, 5), (2, 7)).toDF("g", "x")
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("x")))
    val stripped = GraftBenchShim.stripRootSort(win) // no root sort here either
    assert(stripped.as[(Int, Int, Int)].collect().toSet ==
      Set((1, 5, 1), (1, 10, 2), (2, 7, 1)))
  }
}
