package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("discrete percentiles: smallest value whose cumulative count reaches ceil(q*n)") {
    // group g: values 1..100 once each -> p50 = 50, p90 = 90, p99 = 99
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("grp", "v")
    val row = StatsOps.exactPercentiles(df, "grp", "v", Seq(0.5, 0.9, 0.99)).collect()(0)
    assert(row.getAs[Long]("p50") == 50L)
    assert(row.getAs[Long]("p90") == 90L)
    assert(row.getAs[Long]("p99") == 99L)
  }

  test("duplicate-heavy values and tiny groups resolve via the histogram") {
    val df = (Seq.fill(9)(1L) :+ 100L).map(("a", _))
      .++(Seq(("b", 7L))).toDF("grp", "v")
    val out = StatsOps.exactPercentiles(df, "grp", "v", Seq(0.5, 0.99))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("p50"), r.getAs[Long]("p99"))).toMap
    assert(out("a") == ((1L, 100L))) // ceil(.5*10)=5th of sorted -> 1; ceil(.99*10)=10th -> 100
    assert(out("b") == ((7L, 7L)))   // singleton group: every percentile is the value
  }

  test("null values are excluded from the distribution and the count") {
    // g: 1..4 plus 6 nulls. With nulls excluded n=4 -> p50 = 2nd value = 2.
    // (Counting nulls toward n would give ceil(.5*10)=5 -> p50 = NULL/4.)
    val df = ((1 to 4).map(v => ("g", Some(v.toLong))) ++
      Seq.fill(6)(("g", Option.empty[Long]))).toDF("grp", "v")
    val row = StatsOps.exactPercentiles(df, "grp", "v", Seq(0.5, 1.0)).collect()(0)
    assert(row.getAs[Long]("p50") == 2L)
    assert(row.getAs[Long]("p100") == 4L)
  }

  test("label formatting survives double arithmetic (0.99 -> p99, 0.999 -> p99_9)") {
    val df = Seq(("g", 1L)).toDF("grp", "v")
    val cols = StatsOps.exactPercentiles(df, "grp", "v", Seq(0.99, 0.999)).columns.toSet
    assert(cols == Set("grp", "p99", "p99_9"))
  }
}
