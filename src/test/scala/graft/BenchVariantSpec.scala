package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Bench variants time the OPERATOR minus harness-only work (oracle
  * determinism sorts, fixture synthesis). That is only honest while the
  * variant still computes the registered query's result — this spec pins
  * every `SparkEntry.benchVariants` entry to the same multiset of rows
  * as the verified `queries` form, so the bench can never drift into
  * timing something the correctness gate does not check. */
class BenchVariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every bench variant matches its registered query's rows") {
    graft.functions.TextFns.registerAll(spark)
    for ((name, vfn) <- SparkEntry.benchVariants) {
      assert(SparkEntry.queries.contains(name),
        s"bench variant $name has no registered query")
      val q = SparkEntry.queries(name)(spark, sfDir)
      val v = vfn(spark, sfDir)
      val qCols = q.columns.toSeq
      assert(qCols.forall(v.columns.contains),
        s"$name variant lost columns: ${qCols.diff(v.columns)}")
      val qRows = q.select(qCols.map(col): _*).collect().map(_.toString).sorted
      val vRows = v.select(qCols.map(col): _*).collect().map(_.toString).sorted
      assert(qRows.length == vRows.length,
        s"$name variant row count ${vRows.length} != query ${qRows.length}")
      assert(qRows.sameElements(vRows),
        s"$name variant rows diverge from the registered query")
    }
  }
}
