package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** groupFractionalSample must equal the naive full-window rank on every
  * input — the prefix prefilter is a plan optimization, not a semantics
  * change — including groups small enough that the min-1 clamp binds and
  * NO row survives the prefix cut (the whole-group fallback path). */
class SampleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, pct: Double) = {
    val w = Window.partitionBy("g")
    df.withColumn("rn", row_number().over(
        w.orderBy(md5(col("id").cast("string")), col("id"))))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("rn") <= greatest(floor(col("cnt") * pct), lit(1)))
      .select("g", "id")
  }

  private def fast(df: org.apache.spark.sql.DataFrame, pct: Double) =
    SampleOps.groupFractionalSample(
      df, Seq("g"), md5(col("id").cast("string")), Seq(col("id")), pct)
      .select("g", "id")

  test("matches the naive window rank on a large group") {
    val df = (1 to 5000).map(i => ("big", i)).toDF("g", "id")
    val exp = naive(df, 0.01).collect().toSet
    val got = fast(df, 0.01).collect().toSet
    assert(got == exp)
    assert(got.size == 50) // floor(5000 * 0.01)
  }

  test("min-1 clamp: every tiny group keeps exactly one row, even when no row survives the prefix cut") {
    // 40 singleton groups: ~96% of them have md5(id) prefix > "0a", so
    // the fallback (scnt < k keeps the whole group) must fire for them.
    val df = (1 to 40).map(i => (s"g$i", i * 1000)).toDF("g", "id")
    val got = fast(df, 0.01)
    assert(got.count() == 40)
    assert(got.collect().toSet == naive(df, 0.01).collect().toSet)
  }

  test("seeded random inputs: fast == naive for every draw") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val nGroups = 1 + rnd.nextInt(30)
      val rows = (1 to 2000).map { i =>
        (s"g${rnd.nextInt(nGroups)}", i * 7 + rnd.nextInt(5))
      }.distinct
      val df = rows.toDF("g", "id")
      val pct = Seq(0.01, 0.03, 0.2)(trial % 3)
      val exp = naive(df, pct).collect().toSet
      val got = fast(df, pct).collect().toSet
      assert(got == exp, s"trial $trial (nGroups=$nGroups pct=$pct)")
    }
  }

  test("mixed group sizes agree with naive across pct values") {
    val df = ((1 to 3000).map(i => ("a", i)) ++ (1 to 700).map(i => ("b", 10000 + i)) ++
      (1 to 3).map(i => ("c", 20000 + i))).toDF("g", "id")
    for (pct <- Seq(0.01, 0.05, 0.5)) {
      val exp = naive(df, pct).collect().toSet
      val got = fast(df, pct).collect().toSet
      assert(got == exp, s"pct=$pct")
    }
  }

  test("input columns named cnt/scnt do not collide with internals") {
    val df = (1 to 500).map(i => ("g", i, i * 2L, i * 3L))
      .toDF("g", "id", "cnt", "scnt")
    val got = SampleOps.groupFractionalSample(
      df, Seq("g"), md5(col("id").cast("string")), Seq(col("id")), 0.01)
    assert(got.columns.toSet == Set("g", "id", "cnt", "scnt"))
    assert(got.count() == 5) // floor(500 * 0.01), user cols untouched
  }
}
