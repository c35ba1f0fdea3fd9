package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{broadcast, col, expr, lit, max, sum}

import graft.TestSpark

/** Pins PageRankOps' fixed-point arithmetic against a driver-side
  * reference implementation, the regular-graph invariant (exactly-
  * divisible degrees lose zero micro-units, so ranks stay at 1e6), and
  * sink/source semantics (pure sinks appear in the output; sources
  * bottom out at the (1-d) base). */
class PageRankOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side reference: same integer update, plain Maps. */
  private def reference(edges0: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = edges0.distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (150000L + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("complete graph K5: ranks stay exactly 1e6 (divisible degrees, zero floor loss)") {
    val k5 = for (i <- 0L to 4L; j <- 0L to 4L if i != j) yield (i, j)
    assert(run(k5) == (0L to 4L).map(_ -> 1000000L).toMap)
  }

  test("chain a->b->c: source decays to base, sink holds upstream mass; matches reference") {
    val chain = Seq((1L, 2L), (2L, 3L))
    val got = run(chain)
    assert(got == reference(chain, 3))
    assert(got(1L) == 150000L) // source: base only after iter 1
    assert(got.keySet == Set(1L, 2L, 3L)) // pure sink 3 present
  }

  test("matches the driver-side reference on a randomized graph, several iteration counts") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == reference(edges, iters), s"iters=$iters")
  }

  test("long dimensionNodes loop: mid-loop checkpoints carry the folded " +
      "degree and still match the reference") {
    // r11 coverage gap: every other classic-branch test runs fewer
    // iterations than checkpointEvery, so the checkpoint of the
    // 3-column folded rank table (node, rank_micro, out_deg) — and the
    // loop resuming FROM it — never executed. iters=5/every=2 forces
    // two mid-loop cuts in both join modes; a graph with a pure sink
    // checks the null out_deg survives the round-trip.
    val rnd = new scala.util.Random(99)
    val edges = (Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b } :+ (3L, 77L)) // 77: pure sink
    import spark.implicits._
    val want = reference(edges, 5)
    for (dim <- Seq(true, false)) {
      val got = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d",
          iters = 5, checkpointEvery = 2, dimensionNodes = dim)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"dimensionNodes=$dim")
    }
  }

  test("duplicate edges collapse; null endpoints dropped") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (null, 5L), (5L, null))
      .toDF("s", "d")
    val got = PageRankOps.pageRank(df, "s", "d", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after dedup this is the symmetric pair: both ranks exactly 1e6
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("dimensionNodes broadcast rounds are value-identical to shuffle rounds") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    import spark.implicits._
    val df = edges.toDF("s", "d")
    val shuffle = PageRankOps.pageRank(df, "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bcast = PageRankOps.pageRank(df, "s", "d", 3, dimensionNodes = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffle == bcast)
  }

  test("dimensionNodes with a pure sink: the folded null degree means " +
      "holds-rank-contributes-nothing, exactly as the shuffle rounds") {
    // r11 degree-fold pin: under dimensionNodes the dense node table
    // carries out_deg via a LEFT join, so a pure sink (node 2) rides
    // the loop with a null degree — the contribution side must filter
    // it, not divide by null or drop the node from the output.
    import spark.implicits._
    val df = Seq((1L, 2L), (3L, 2L)).toDF("s", "d")
    val bcast = PageRankOps.pageRank(df, "s", "d", iters = 2, dimensionNodes = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-rolled: r1(2) = 150000 + 85*(1e6+1e6) div 100 = 1,850,000;
    // r2(2) = 150000 + 85*(150000+150000) div 100 = 405,000; sources
    // bottom out at the 150000 base.
    assert(bcast == Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
    val shuffle = PageRankOps.pageRank(df, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffle == bcast)
  }

  test("dimensionNodes=false BINDS: the rank table never rides a broadcast") {
    // The caller's "nodes are fact-scaled" declaration must force keyed
    // joins for the RANK-side round tables even when tiny at test scale
    // — otherwise Spark's under-10MB estimate auto-broadcasts them and
    // the declared web-scale plan is never exercised anywhere (r10
    // maybeB fix). The one-time degree build join may still broadcast:
    // post-aggregate lineage has a sound estimate, so AQE flips it
    // keyed exactly when real sizes demand (estimate-soundness
    // doctrine).
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    import spark.implicits._
    val root = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", 2)
      .queryExecution.executedPlan
    val bSubs = scala.collection.mutable.Buffer[String]()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          bSubs += b.child.toString
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk); p.subqueries.foreach(walk)
    }
    walk(root)
    for (s <- bSubs)
      assert(!s.contains("rank_micro") && !s.contains("contrib"),
        s"shuffle-mode pageRank broadcasts a rank-side table:\n${s.take(400)}")
    assert(root.toString.contains("ShuffledHashJoin"),
      "shuffle-mode pageRank lost its keyed joins")
  }

  /** Driver-side PPR reference: seed-only restart mass, start = seeds. */
  private def referencePpr(edges0: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val edges = edges0.distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def base(n: Long) = if (seeds(n)) 150000L else 0L
    var r = nodes.map(n => n -> base(n)).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (base(n) + 85L * mass.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("personalized PageRank: seed-only restart mass, unreached nodes exactly 0; matches reference") {
    import spark.implicits._
    // two components: {1,2,3} seeded via 1; {10,11} unseeded -> exact 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
    val seeds = Set(1L)
    val got = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", iters = 3,
        restartSeeds = Some(Seq(1L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referencePpr(edges, seeds, 3))
    assert(got(10L) == 0L && got(11L) == 0L, "unseeded component must be exact 0")
    assert(got(1L) >= 150000L, "seed keeps its restart mass")
    // and the broadcast-round variant is value-identical
    val bcast = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", iters = 3,
        dimensionNodes = true, restartSeeds = Some(Seq(1L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bcast == got)
    // the predicate form of the same seed set is value-identical too
    val byPred = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d", iters = 3,
        restartWhere = Some(col("node") === 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byPred == got)
  }

  test("PPR frontier rounds match the dense reference on randomized graphs (property)") {
    import spark.implicits._
    // The frontier-restricted seeded rounds (sparse union+agg update,
    // zeros materialized once) must replay the dense driver-side
    // reference bit-for-bit on arbitrary graphs: random edges, random
    // seed sets (incl. seeds not in the graph, which must be ignored),
    // several iteration counts, both join modes and both seed specs.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 4) {
      val n = 6 + rnd.nextInt(8)
      val edges = Seq.fill(12 + rnd.nextInt(20))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val seeds = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(n + 3).toLong)
      val iters = 1 + rnd.nextInt(4)
      val inGraph = (edges.map(_._1) ++ edges.map(_._2)).toSet
      val want = referencePpr(edges, seeds.toSet.filter(inGraph), iters)
      if (edges.nonEmpty) {
        val byDf = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d",
            iters = iters, restartSeeds = Some(seeds.toDF("node")))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(byDf == want, s"trial $trial (df seeds): edges=$edges seeds=$seeds iters=$iters")
        val byDfB = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d",
            iters = iters, dimensionNodes = true,
            restartSeeds = Some(seeds.toDF("node")))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(byDfB == want, s"trial $trial (broadcast): edges=$edges seeds=$seeds iters=$iters")
        val seedSet = seeds.toSet
        val byPred = PageRankOps.pageRank(edges.toDF("s", "d"), "s", "d",
            iters = iters,
            restartWhere = Some(col("node").isin(seedSet.toSeq: _*)))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(byPred == want, s"trial $trial (predicate): edges=$edges seeds=$seeds iters=$iters")
      }
    }
  }

  test("sourcesSpanNodes on a mirrored graph is value-identical (both modes)") {
    import spark.implicits._
    val fwd = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
    val sym = fwd ++ fwd.map { case (a, b) => (b, a) }
    def run(dim: Boolean, span: Boolean) =
      PageRankOps.pageRank(sym.toDF("s", "d"), "s", "d", iters = 3,
          dimensionNodes = dim, sourcesSpanNodes = span)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(dim = false, span = false)
    assert(run(dim = false, span = true) == base)
    assert(run(dim = true, span = true) == base)
    assert(base.keySet == Set(1L, 2L, 3L, 10L, 11L))
  }

  test("HITS on a star: center is the sole authority, leaves tie as hubs, max-norm pins 1e6") {
    import spark.implicits._
    // leaves 1..4 all point at center 9
    val edges = (1L to 4L).map(l => (l, 9L))
    val got = HitsOps.hubsAndAuthorities(edges.toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("auth", 9L)) == 1000000L, "sole authority max-normalizes to 1e6")
    for (l <- 1L to 4L)
      assert(got(("hub", l)) == 1000000L, s"leaf $l: symmetric hubs all tie at the max")
    assert(got.size == 5)
  }

  test("HITS separates hub breadth from authority demand; every round max is exactly 1e6") {
    import spark.implicits._
    // supplier 1 stocks parts 10,11,12; supplier 2 stocks only 10.
    // part 10 is demanded by both -> top authority; supplier 1 -> top hub.
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
    val got = HitsOps.hubsAndAuthorities(edges.toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("hub", 1L)) == 1000000L && got(("auth", 10L)) == 1000000L)
    assert(got(("hub", 2L)) < got(("hub", 1L)), "narrow supplier ranks below broad one")
    for (p <- Seq(11L, 12L))
      assert(got(("auth", p)) < got(("auth", 10L)), s"single-source part $p below shared part")
    // dimensionNodes variant value-identical
    val bcast = HitsOps.hubsAndAuthorities(edges.toDF("s", "d"), "s", "d",
        iters = 2, dimensionNodes = true)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bcast == got)
  }

  test("HITS: the fused first half-round (1e6 x indegree) equals the " +
      "generic seed-join replay on a randomized graph") {
    import spark.implicits._
    // r10 fusion pin (the labelPropagation treatment): seed hubs are a
    // constant 1e6, so the first authority aggregate is 1e6 x indegree
    // over the distinct edge list. Replay the generic rule end-to-end
    // for iters=1 and compare, so an edit to the fusion can't drift.
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val df = edges.toDF("s", "d")
    val fused = HitsOps.hubsAndAuthorities(df, "s", "d", iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e = df.distinct()
    def norm(raw: org.apache.spark.sql.DataFrame, k: String, v: String) =
      raw.crossJoin(broadcast(raw.agg(max(col(v)).as("__mx"))))
        .select(col(k), expr(
          s"CAST((CAST($v AS DECIMAL(38,0)) * 1000000) div __mx AS BIGINT)").as(v))
    val seed = e.select(col("s")).distinct().withColumn("h", lit(1000000L))
    val auths = norm(e.join(seed, Seq("s")).groupBy("d")
      .agg(sum(col("h")).as("a")), "d", "a")
    val hubs = norm(e.join(auths, Seq("d")).groupBy("s")
      .agg(sum(col("a")).as("h")), "s", "h")
    val generic =
      auths.select(lit("auth").as("k"), col("d").as("n"), col("a").as("v"))
        .unionByName(hubs.select(lit("hub").as("k"), col("s").as("n"), col("h").as("v")))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fused == generic, s"fused $fused\ngeneric $generic")
  }
}
