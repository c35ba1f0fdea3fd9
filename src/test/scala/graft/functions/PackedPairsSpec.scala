package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** packed_pairs (VectorExprs.scala) replaces the basket/postings pair
  * SELF-JOIN on the claim of exact pair-multiset equivalence — these
  * tests pin that claim against the join formulation on random id
  * lists, plus the loud-failure contract (out-of-range ids throw, they
  * never truncate into a colliding key). */
class PackedPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference: the self-join pair set {(a,b) : a<b, both in xs}. */
  private def refPairs(xs: Seq[Long], shift: Int): Seq[Long] =
    for {
      a <- xs.sorted; b <- xs.sorted if a < b
    } yield (a << shift) | b

  test("equals the a<b self-join pair multiset on random distinct lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lists = (0 until 40).map { i =>
      val n = rnd.nextInt(9) // 0..8 elements, incl. empty and singleton
      scala.util.Random.shuffle((0L until 40L).toList).take(n)
    }
    val got = lists.toDF("ps")
      .select(expr("packed_pairs(ps, 20)").as("pk"))
      .as[Seq[Long]].collect()
    lists.zip(got).foreach { case (xs, pks) =>
      assert(pks == refPairs(xs, 20), s"list $xs")
    }
  }

  test("emitted keys are sorted by (lo, hi) — the sorted-input loop order") {
    import spark.implicits._
    val got = Seq(Seq(9L, 1L, 5L, 3L)).toDF("ps")
      .select(expr("packed_pairs(ps, 8)").as("pk"))
      .as[Seq[Long]].collect().head
    assert(got == got.sorted)
    assert(got == Seq((1L << 8) | 3L, (1L << 8) | 5L, (1L << 8) | 9L,
      (3L << 8) | 5L, (3L << 8) | 9L, (5L << 8) | 9L))
  }

  test("out-of-range ids throw (never a silently colliding pack)") {
    import spark.implicits._
    val over = intercept[Exception] {
      Seq(Seq(1L, 256L)).toDF("ps")
        .select(expr("packed_pairs(ps, 8)")).collect()
    }
    assert(over.getMessage.contains("packed_pairs") ||
      over.getCause.getMessage.contains("packed_pairs"))
    val neg = intercept[Exception] {
      Seq(Seq(-1L, 3L)).toDF("ps")
        .select(expr("packed_pairs(ps, 8)")).collect()
    }
    assert(neg.getMessage.contains("packed_pairs") ||
      neg.getCause.getMessage.contains("packed_pairs"))
  }

  test("duplicate ids throw (a dup would pack a lo==hi self-pair key)") {
    import spark.implicits._
    val dup = intercept[Exception] {
      Seq(Seq(5L, 1L, 5L)).toDF("ps")
        .select(expr("packed_pairs(ps, 8)")).collect()
    }
    val msg = Option(dup.getCause).fold(dup.getMessage)(_.getMessage)
    assert(msg.contains("duplicate"), msg)
    // kernel-direct (interpreted) path throws the same way
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(3L, 3L))
    val k = intercept[IllegalArgumentException] {
      PackedPairsKernel.pairs(arr, 8)
    }
    assert(k.getMessage.contains("duplicate"))
  }

  test("null array propagates null; interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq((1, Some(Seq(2L, 7L))), (2, None))
      .toDF("id", "ps0")
      // Option[Seq[Long]] encodes as ARRAY<BIGINT> containsNull=false
      .select(col("id"), col("ps0").as("ps"))
    val rows = df.select(col("id"), expr("packed_pairs(ps, 10)").as("pk"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) == Seq((2L << 10) | 7L))
    assert(rows(1).isNullAt(1))
    // force the interpreted path through the kernel directly
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(2L, 7L))
    val out = PackedPairsKernel.pairs(arr, 10)
    assert(out.toLongArray().toSeq == Seq((2L << 10) | 7L))
  }

  test("containsNull=true input is rejected at analysis, not read as zero") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(Seq(Some(1L), None)).toDF("ps")
        .select(expr("packed_pairs(ps, 8)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("containsnull") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("shift bounds are enforced at construction") {
    intercept[IllegalArgumentException] {
      PackedPairsExpr(org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)), 32)
    }
    intercept[IllegalArgumentException] {
      PackedPairsExpr(org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)), 0)
    }
  }
}
