package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** momentsFp against the textbook central-moment identities computed in
  * BigInt, and triangleStats against brute-force triple enumeration —
  * both on adversarial small inputs (skewed values, duplicate/reversed/
  * self-loop edges) where a formula slip shows up as an exact-integer
  * mismatch, not a tolerance smudge. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refMoments(vs: Seq[Long]): (Long, Long, Long, Long) = {
    val n = BigInt(vs.size)
    val s1 = vs.map(BigInt(_)).sum
    val s2 = vs.map(v => BigInt(v) * v).sum
    val s3 = vs.map(v => BigInt(v) * v * v).sum
    val s4 = vs.map(v => BigInt(v) * v * v * v).sum
    val n2 = n * s2 - s1 * s1
    val n3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    val n4 = n * n * n * s4 - 4 * n * n * s1 * s3 +
      6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
    val mean = (s1 * 1000000 / n).toLong
    val vr = (n2 * 1000000 / (n * n)).toLong
    val skew = math.floor(
      (1000000.0 * n3.toDouble) / (n2.toDouble * math.sqrt(n2.toDouble))).toLong
    val kurt = math.floor(
      (1000000.0 * n.toDouble * n4.toDouble) / (n2.toDouble * n2.toDouble)).toLong
    (mean, vr, skew, kurt)
  }

  test("momentsFp matches the BigInt identities on a right-skewed group") {
    // Zipf-ish tail: mostly small values, a few large — skew must be > 0
    // and kurtosis well above 3e6 (heavy tail).
    val vs: Seq[Long] = Seq.fill(50)(1L) ++ Seq.fill(20)(2L) ++
      Seq.fill(5)(10L) ++ Seq(40L, 45L, 50L)
    val df = vs.map(("g", _)).toDF("grp", "v")
    val r = StatsOps.momentsFp(df, Seq("grp"), "v").collect()(0)
    val (mean, vr, skew, kurt) = refMoments(vs)
    assert(r.getAs[Long]("n") == vs.size)
    assert(r.getAs[Long]("mean_ppm") == mean)
    assert(r.getAs[Long]("var_ppm") == vr)
    assert(r.getAs[Long]("skew_ppm") == skew)
    assert(r.getAs[Long]("kurt_ppm") == kurt)
    assert(skew > 0, "right-skewed fixture must report positive skew")
    assert(kurt > 3000000L, "heavy-tailed fixture must exceed normal kurtosis")
  }

  test("momentsFp: symmetric values give zero skew; groups are independent; nulls excluded") {
    val sym: Seq[Long] = Seq(1L, 2L, 2L, 3L, 3L, 3L, 4L, 4L, 5L)
    val df = (sym.map(v => ("s", Some(v))) ++
      Seq.fill(25)(("t", Some(7L))) ++ Seq(("t", Some(8L))) ++
      Seq(("s", Option.empty[Long]), ("t", Option.empty[Long])))
      .toDF("grp", "v")
    val out = StatsOps.momentsFp(df, Seq("grp"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val (_, _, skewS, _) = refMoments(sym)
    assert(out("s").getAs[Long]("n") == sym.size) // null row not counted
    assert(out("s").getAs[Long]("skew_ppm") == skewS)
    assert(skewS == 0L, "symmetric fixture skews to exactly 0 ppm")
    // group t: 25 sevens + one 8 -> mean just above 7, skew strongly +
    val (meanT, _, skewT, _) =
      refMoments(Seq.fill(25)(7L) :+ 8L)
    assert(out("t").getAs[Long]("mean_ppm") == meanT)
    assert(out("t").getAs[Long]("skew_ppm") == skewT)
    assert(skewT > 4000000L)
  }

  private def refTriangles(raw: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Option[Long]) = {
    val e = raw.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct
    val es = e.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val deg = nodes.map(n => e.count(p => p._1 == n || p._2 == n).toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val tri = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      if es((nodes(i), nodes(j))) && es((nodes(j), nodes(k))) &&
        es((nodes(i), nodes(k)))
    } yield 1).size.toLong
    val cc = if (wedges > 0) Some(3 * tri * 1000000L / wedges) else None
    (nodes.size.toLong, e.size.toLong, wedges, tri, cc)
  }

  private def check(raw: Seq[(Long, Long)]): Unit = {
    val (nn, ne, nw, nt, cc) = refTriangles(raw)
    val r = GraphOps.triangleStats(raw.toDF("x", "y"), "x", "y").collect()(0)
    assert(r.getAs[Long]("n_nodes") == nn)
    assert(r.getAs[Long]("n_edges") == ne)
    assert(r.getAs[Long]("n_wedges") == nw)
    assert(r.getAs[Long]("n_triangles") == nt)
    assert(Option(r.getAs[Any]("global_cc_ppm")).map(_.asInstanceOf[Long]) == cc)
  }

  test("triangleStats matches brute force on a seeded random multigraph") {
    // Raw input deliberately dirty: duplicates, both orientations, and
    // self-loops — the operator must canonicalize before counting.
    val rnd = new scala.util.Random(42)
    val raw = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    check(raw)
  }

  test("triangleStats: K4 is all-closed, a star is triangle-free") {
    val k4 = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val (_, _, w, t, cc) = refTriangles(k4)
    assert((w, t, cc) == ((12L, 4L, Some(1000000L)))) // transitivity 1.0
    check(k4)
    check((1 to 8).map(i => (0L, i.toLong))) // star: wedges 28, triangles 0
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("gap stats match a collected-and-recomputed reference at sf0.001") {
    // Independent reference: collect the (small) fixture, sort per user
    // by (ts, event_id) in scala, diff epoch-us, aggregate — no Spark
    // window involved.
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.groupBy(_._1).collect { case (u, rows) if rows.length > 1 =>
      val gaps = rows.sortBy(r => (r._3, r._2)).sliding(2)
        .map { case Array(a, b) => b._3 - a._3 }.toSeq
      u -> ((gaps.size.toLong, gaps.min, gaps.max, gaps.sum / gaps.size))
    }
    val got = graft.SparkEntry.queries("w12_gap_stats")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == ref.toMap)
  }

  test("assortativity matches the BigInt Pearson reference at sf0.001") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, o) => v -> BigInt(o.size) }
    val xy = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val n = BigInt(xy.size)
    val sx = xy.map(_._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val expected = ((n * sxy - sx * sx) * 1000000) / (n * sxx - sx * sx)
    val r = graft.SparkEntry.queries("g3_assortativity")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == edges.size.toLong)
    assert(r.getLong(1) == expected.toLong)
  }

  test("cube adds exactly the source-only margin over rollup") {
    val cube = graft.SparkEntry.queries("a18_cube")(spark, sfDir).collect()
    val roll = graft.SparkEntry.queries("a15_rollup")(spark, sfDir).collect()
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.get(0)), Option(r.get(1)), r.getInt(2))
    val extra = cube.map(key).toSet -- roll.map(key).toSet
    assert(extra.nonEmpty && extra.forall(_._3 == 2),
      s"cube-only rows must all be the gid=2 source margin: $extra")
    // the grand total (gid=3) agrees between the two groupings
    val tot = cube.filter(_.getInt(2) == 3).map(_.getLong(3)).head
    assert(tot == roll.filter(_.getInt(2) == 3).map(_.getLong(3)).head)
  }

  test("triangleStats: degree-tie orientation stays a strict total order") {
    // A 5-cycle: every degree equal, so orientation ties break by id
    // alone — 5 wedges, 0 triangles. Then one chord closes exactly one.
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    check(cyc)
    check(cyc :+ (0L, 2L))
  }
}
