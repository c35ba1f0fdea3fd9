package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BfsOps against a brute-force Scala BFS on a dirty directed graph,
  * and the registered t_ks_drift / t_pmi_pairs queries against full
  * Scala reference implementations of the same integer arithmetic —
  * exact equality everywhere (the house fixed-point discipline means a
  * formula slip is an integer mismatch, never a tolerance smudge). */
class AssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ------------------------------------------------------------- BfsOps

  private def bruteBfs(
      edges: Seq[(Long, Long)], seeds: Set[Long], maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    var dist = seeds.filter(nodes).map(_ -> 0L).toMap
    for (h <- 1 to maxHops) {
      val frontier = dist.collect { case (n, d) if d == h - 1 => n }
      val reached = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
      dist = dist ++ reached.filterNot(dist.contains).map(_ -> h.toLong).toMap
    }
    nodes.map(n => n -> dist.getOrElse(n, -1L)).toMap
  }

  test("multiSourceBfs matches brute-force on a dirty directed graph") {
    import spark.implicits._
    // duplicates, a self-loop, a reverse edge, a disconnected component,
    // and a node (5) exactly one hop past the horizon.
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 3L), (3L, 4L),
      (4L, 5L), (2L, 1L), (10L, 11L))
    val seeds = Set(1L, 10L, 99L) // 99 is not a graph node: must not appear
    val got = BfsOps.multiSourceBfs(
        edges.toDF("s", "d"), "s", "d", seeds.toSeq.toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteBfs(edges, seeds, 3)
    assert(got == want)
    assert(got(5L) == -1L, "one hop past the horizon must be unreached")
    assert(!got.contains(99L), "a seed outside the graph is not a node")
  }

  test("multiSourceBfs directedness: no seed-reaching via reversed edges") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L)) // 3 points INTO 2; 2 cannot reach 3
    val got = BfsOps.multiSourceBfs(
        edges.toDF("s", "d"), "s", "d", Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> -1L))
  }

  // ----------------------------------------------------- fixture helper

  /** Scratch dir holding ONLY documents.parquet with (doc_id, text,
    * lang, n_chars) rows. */
  private def docsDir(rows: Seq[(Long, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_assoc").toString
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def lnFp(n: Long): Long =
    math.floor(1e6 * math.log(n.toDouble)).toLong

  // ---------------------------------------------------------- t_ks_drift

  test("t_ks_drift: identical length distributions give exactly 0 ppm") {
    val lens = Seq(10L, 20L, 20L, 30L, 50L)
    val rows = lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, "x", "en", l)
    } ++ lens.zipWithIndex.map { case (l, i) =>
      (100L + i, "x", "vi", l)
    }
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("n_en") == 5L && r.getAs[Long]("n_other") == 5L)
    assert(r.getAs[Long]("ks_d_ppm") == 0L,
      "identical distributions must be an exact integer zero, no tolerance")
  }

  test("t_ks_drift: disjoint supports give exactly 1e6 ppm at the crossover") {
    val rows = (0 until 4).map(i => (i.toLong, "x", "en", 10L + i)) ++
      (0 until 6).map(i => (50L + i, "x", "vi", 100L + i))
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("ks_d_ppm") == 1000000L)
    // max first attained once all of en has accumulated: at_chars = 13
    // (ties broken toward the smallest value)
    assert(r.getAs[Long]("at_chars") == 13L)
  }

  test("t_ks_drift matches a Scala reference on a mixed fixture") {
    val en = Seq(5L, 5L, 8L, 9L, 12L, 20L)
    val vi = Seq(5L, 9L, 9L, 14L, 20L, 20L, 33L)
    val rows = en.zipWithIndex.map { case (l, i) => (i.toLong, "x", "en", l) } ++
      vi.zipWithIndex.map { case (l, i) => (100L + i, "x", "vi", l) }
    val spine = (en ++ vi).distinct.sorted
    val d = spine.map { v =>
      val fp = en.count(_ <= v).toLong
      val fq = vi.count(_ <= v).toLong
      (math.abs(fp * vi.size - fq * en.size), v)
    }
    val (dnum, at) = d.maxBy { case (dn, v) => (dn, -v) }
    val r = graft.SparkEntry.queries("t_ks_drift")(spark, docsDir(rows))
      .collect().head
    assert(r.getAs[Long]("at_chars") == at)
    assert(r.getAs[Long]("ks_d_ppm") ==
      dnum * 1000000L / (en.size.toLong * vi.size))
  }

  // --------------------------------------------------------- t_pmi_pairs

  /** Full Scala reference of the PMI query's integer arithmetic over
    * the same tokenization (maximal lowercase-alpha runs, length ≥ 3,
    * per-doc adjacency bigrams). */
  private def refPmi(texts: Seq[String], minSupport: Long, k: Int)
      : Seq[(String, String, Long, Long)] = {
    val toks = texts.map("[a-z]{3,}".r.findAllIn(_).toList)
    val bigrams = toks.flatMap(ts => ts.zip(ts.drop(1)))
    val c12 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n12 = c12.values.sum
    val n1 = uni.values.sum
    c12.toSeq.filter(_._2 >= minSupport)
      .map { case ((w1, w2), s) =>
        val pmi = lnFp(s) + 2 * lnFp(n1) - lnFp(n12) - lnFp(uni(w1)) - lnFp(uni(w2))
        (w1, w2, s, pmi)
      }
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(k)
  }

  test("t_pmi_pairs matches the Scala reference and ranks the collocation first") {
    // "foo bar" always adjacent (a true collocation); "the" is frequent
    // everywhere, so "the xxx" pairs have high support but low PMI; a
    // pair seen twice misses the support floor of 3.
    val docs = Seq(
      "foo bar sits near the window and the door",
      "the cat saw foo bar under the table",
      "foo bar and the dog ran past the gate",
      "rare pair rare pair the end",
      "the cat and the dog and the end")
    val rows = docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", t.length.toLong)
    }
    val got = graft.SparkEntry.queries("t_pmi_pairs")(spark, docsDir(rows))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("support"),
        r.getAs[Long]("pmi_fp"))).toSeq
    val want = refPmi(docs.map(_.toLowerCase), 3, 20)
    assert(got == want)
    assert(got.head._1 == "foo" && got.head._2 == "bar",
      "the always-adjacent pair must outrank frequent-word pairs")
    assert(!got.exists(p => p._1 == "rare" || p._2 == "rare"),
      "support floor must exclude the twice-seen pair")
  }
}
