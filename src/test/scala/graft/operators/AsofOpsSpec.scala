package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest at-or-before match per key, null when none precedes") {
    val left = Seq((1, "k1", 10L), (2, "k1", 20L), (3, "k1", 5L), (4, "k2", 10L))
      .toDF("lid", "k", "t")
    val right = Seq(("k1", 8L, "a"), ("k1", 15L, "b"), ("k3", 1L, "z"))
      .toDF("k", "t", "tag")
    val out = AsofOps.asofJoin(left, right, "k", "t", Seq("tag"))
      .select("lid", "tag").as[(Int, Option[String])].collect().toMap
    assert(out(1) == Some("a"))  // 8 <= 10 < 15
    assert(out(2) == Some("b"))  // latest of {8, 15}
    assert(out(3) == None)       // nothing at-or-before 5
    assert(out(4) == None)       // no right rows for k2 at all
  }

  test("asofJoin: equal timestamps match (<= semantics, like an inclusive ASOF)") {
    val left = Seq((1, "k", 10L)).toDF("lid", "k", "t")
    val right = Seq(("k", 10L, 99)).toDF("k", "t", "v")
    val out = AsofOps.asofJoin(left, right, "k", "t", Seq("v"))
      .select("lid", "v").as[(Int, Option[Int])].collect().toMap
    assert(out(1) == Some(99))
  }

  test("seeded random inputs: matches the in-memory reference model") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val keys = (0 until 5).map(i => s"k$i")
      val left = (1 to 300).map(i =>
        (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong))
      // unique (k, t) on the right, per the operator contract
      val right = rnd.shuffle(
        (for (k <- keys; t <- 0 until 1000 by (3 + rnd.nextInt(5))) yield (k, t.toLong))
      ).take(200).distinct.map { case (k, t) => (k, t, s"$k@$t") }
      val model: Map[Int, Option[String]] = left.map { case (lid, k, t) =>
        lid -> right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      val out = AsofOps.asofJoin(
          left.toDF("lid", "k", "t"), right.toDF("k", "t", "tag"), "k", "t", Seq("tag"))
        .select("lid", "tag").as[(Int, Option[String])].collect().toMap
      assert(out == model, s"trial $trial")
    }
  }

  test("asofJoin: left columns survive untouched, payload can be multi-column") {
    val left = Seq((1, "k", 10L, "keep")).toDF("lid", "k", "t", "extra")
    val right = Seq(("k", 3L, 7, "m")).toDF("k", "t", "v", "w")
    val row = AsofOps.asofJoin(left, right, "k", "t", Seq("v", "w")).collect()(0)
    assert(row.getAs[String]("extra") == "keep")
    assert(row.getAs[Int]("v") == 7 && row.getAs[String]("w") == "m")
  }

  test("asofJoin: payload name colliding with a left column is rejected") {
    val left = Seq((1, "k", 10L, "x")).toDF("lid", "k", "t", "v")
    val right = Seq(("k", 3L, 7)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      AsofOps.asofJoin(left, right, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }
}
