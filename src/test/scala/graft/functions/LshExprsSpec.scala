package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** lsh_bucket / lsh_table_buckets (VectorExprs.scala) replaced the
  * boxed-UDF bucket computations (r12) on the claim of bit-identical
  * arithmetic — these tests pin the kernels against an independent
  * boxed reference implementation on random vectors, the null contract
  * (null/short vector → null, never an NPE or a zero-read), both
  * element types (float and double arrays), and the rp_project sign
  * identity that ties the single-table family to one geometry. */
class LshExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent reference: the former UDF's arithmetic, boxed. */
  private def refBucket(v: Seq[Double], signs: Array[Array[Double]],
      nPlanes: Int, dim: Int): Int = {
    var bucket = 0
    for (i <- 0 until nPlanes) {
      var acc = 0.0
      for (j <- 0 until dim) acc += v(j) * signs(i)(j)
      bucket = (bucket << 1) | (if (acc >= 0) 1 else 0)
    }
    bucket
  }
  private def planeSigns(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((i, j) => VectorKernels.planeSign(i, j).toDouble)
  private def tableSigns(t: Int, nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)(
      (i, j) => VectorKernels.tablePlaneSign(t, i, j).toDouble)

  test("lsh_bucket equals the boxed reference on random double vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(30)(Seq.fill(16)(rnd.nextGaussian()))
    val got = vecs.toDF("v")
      .select(expr("lsh_bucket(v, 6, 16)")).as[Int].collect()
    val signs = planeSigns(6, 16)
    vecs.zip(got).foreach { case (v, b) =>
      assert(b == refBucket(v, signs, 6, 16), s"vector $v")
    }
  }

  test("lsh_table_buckets equals per-table references, tables independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val vecs = Seq.fill(20)(Seq.fill(8)(rnd.nextGaussian()))
    val got = vecs.toDF("v")
      .select(expr("lsh_table_buckets(v, 4, 5, 8)")).as[Seq[Int]].collect()
    for ((v, bs) <- vecs.zip(got)) {
      assert(bs.length == 4)
      for (t <- 0 until 4)
        assert(bs(t) == refBucket(v, tableSigns(t, 5, 8), 5, 8),
          s"table $t of $v")
    }
    // the 4 tables are genuinely independent draws: across the batch
    // at least one vector must land in differing buckets between tables
    assert(got.exists(bs => bs.distinct.length > 1),
      "all tables agreed on every vector — seeds not independent?")
  }

  test("float input matches double input bit-for-bit after widening") {
    import spark.implicits._
    val rnd = new scala.util.Random(13) // hoisted: a Random inside the
    // fill body reseeds per element and degenerates every vector to one
    // repeated constant (caught in r12 review)
    val vecs = Seq.fill(10)(Seq.fill(8)(rnd.nextGaussian().toFloat))
    val asF = vecs.toDF("v") // array<float>
    val asD = vecs.map(_.map(_.toDouble)).toDF("v")
    val bf = asF.select(expr("lsh_bucket(v, 4, 8)")).as[Int].collect().toSeq
    val bd = asD.select(expr("lsh_bucket(v, 4, 8)")).as[Int].collect().toSeq
    assert(bf == bd)
    val tf = asF.select(expr("lsh_table_buckets(v, 3, 4, 8)")).as[Seq[Int]]
      .collect().toSeq
    val td = asD.select(expr("lsh_table_buckets(v, 3, 4, 8)")).as[Seq[Int]]
      .collect().toSeq
    assert(tf == td)
  }

  test("null and short vectors yield null, never a zero-read") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1.0, 2.0, 3.0, 4.0))),
      (2, None),
      (3, Some(Seq(1.0, 2.0)))) // shorter than dim
      .toDF("id", "v")
    val rows = df.select(col("id"), expr("lsh_bucket(v, 3, 4)").as("b"),
        expr("lsh_table_buckets(v, 2, 3, 4)").as("tb"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("non-vector input is rejected at analysis") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("v")
        .select(expr("lsh_bucket(v, 3, 2)")).collect()
    }
    assert(err.getMessage.contains("ARRAY<FLOAT|DOUBLE>") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("two calls in one stage codegen cleanly (no fixed-local collision)") {
    // Non-nullable children (array() literals) make nullSafeCodeGen
    // emit the kernel snippet UNBRACED at method scope, so a fixed
    // local name in doGenCode would redeclare on the second call and
    // janino would reject the stage as a silent interpreted fallback —
    // the sorted_intersect_count r11 defect class. Disabling the
    // fallback turns the regression into a hard failure.
    // All-literal arguments would be CONSTANT-FOLDED (evaluated
    // interpreted at optimization time, never reaching codegen — a
    // vacuous test). The vectors must be non-foldable AND non-nullable:
    // transform over sequence() of the range id gives containsNull=false
    // arrays whose eval lands inline in the range stage's ONE generated
    // method, where a fixed local redeclares.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.range(1, 3).selectExpr(
          "transform(sequence(0L, 1L), x -> CAST(id + x AS DOUBLE)) AS v1",
          "transform(sequence(0L, 1L), x -> CAST(id * 2 + x AS DOUBLE)) AS v2")
        .selectExpr(
          "lsh_bucket(v1, 3, 2) AS a", "lsh_bucket(v2, 3, 2) AS b",
          "lsh_table_buckets(v1, 2, 3, 2) AS c",
          "lsh_table_buckets(v2, 2, 3, 2) AS d",
          "rp_project(v1, 3, 2) AS e", "rp_project(v2, 3, 2) AS f",
          "vec_dot(v1, v2, 2) AS g", "vec_dot(v2, v1, 2) AS h",
          "vec_sqnorm(v1, 2) AS i", "vec_sqnorm(v2, 2) AS j",
          "vec_sqdist(v1, v2, 2) AS k", "vec_sqdist(v2, v1, 2) AS l")
        .orderBy("g").collect()
      assert(r.length == 2)
      (0 until 12).foreach(i => assert(!r(0).isNullAt(i), s"col $i null"))
      // id=1: v1=[1,2], v2=[2,3] → dot 8, sqnorm(v1) 5, sqdist 2
      assert(r(0).getDouble(6) == 8.0, r(0).toString)
      assert(r(0).getDouble(8) == 5.0 && r(0).getDouble(10) == 2.0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("sign(rp_project[i]) reproduces bit i of lsh_bucket (shared geometry)") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val vecs = Seq.fill(10)(Seq.fill(8)(rnd.nextGaussian()))
    val rows = vecs.toDF("v")
      .select(expr("lsh_bucket(v, 5, 8)").as("b"),
        expr("rp_project(v, 5, 8)").as("p"))
      .collect()
    rows.foreach { r =>
      val b = r.getInt(0)
      val p = r.getSeq[Double](1)
      for (i <- 0 until 5) {
        val bit = (b >> (4 - i)) & 1
        assert(bit == (if (p(i) >= 0) 1 else 0), s"plane $i: bucket $b proj $p")
      }
    }
  }
}
