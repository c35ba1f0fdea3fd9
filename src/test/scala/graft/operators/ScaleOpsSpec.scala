package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-5 scale operators: sequence packing, binned range join, KMV
  * distinct sketch, quota sampling. Each test pins the property that the
  * operator's scale shape must not change: packing covers the token
  * stream exactly; the binned join equals the naive inequality join; the
  * KMV estimate is partitioning-invariant and within its error bound;
  * quota sampling respects quotas, caps, and determinism. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ PackOps

  private def packed(budget: Int) = {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 500L), ("s1", 3L, 12L), ("s1", 4L, 1024L),
      ("s2", 10L, 1L), ("s2", 11L, 0L), ("s2", 12L, 511L), ("s2", 13L, 2L))
      .toDF("shard", "doc_id", "n")
    PackOps.packSequences(docs, "shard", Seq("doc_id"), col("n"), budget)
  }

  test("packSequences: token stream is covered contiguously, no gaps or overlaps") {
    val rows = packed(512)
      .select("shard", "doc_id", "n_tok", "tok_start", "seq_first",
        "seq_offset", "seq_last", "n_seqs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(t => (t._1, t._2))
    // zero-token doc 11 is dropped
    assert(!rows.exists(_._2 == 11L))
    // per shard: tok_start of doc i == tok_start + n_tok of doc i-1
    rows.groupBy(_._1).foreach { case (_, ds) =>
      ds.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 == a._4 + a._3)
        case _         =>
      }
      assert(ds.head._4 == 0L)
    }
    rows.foreach { case (_, _, n, start, first, off, last, nseqs) =>
      assert(first == start / 512 && off == start % 512)
      assert(last == (start + n - 1) / 512)
      assert(nseqs == last - first + 1)
    }
    // doc 4 (1024 tok starting at 612) spans sequences 1..3
    val d4 = rows.find(_._2 == 4L).get
    assert(d4._5 == 1L && d4._7 == 3L && d4._8 == 3L)
  }

  test("packSequences: shards pack independently — ids never cross shards") {
    val byShard = packed(512).groupBy("shard")
      .agg(min("seq_first").as("mn")).collect()
    byShard.foreach(r => assert(r.getLong(1) == 0L)) // each shard restarts at seq 0
  }

  test("chunkOverlap: starts advance by stride, every token covered, tail chunk short") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("id", "txt")
    // regex tokenizer, not split: split('', ' ') is [''] — one empty token
    val rows = PackOps.chunkOverlap(docs,
        expr("regexp_extract_all(txt, '[a-z0-9]+', 0)"), size = 4, stride = 3)
      .select("id", "chunk_idx", "tok_start", "n_tok", "chunk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    // empty doc 2 emits nothing; doc 1 (10 tokens): starts 0,3,6,9
    assert(rows.forall(_._1 == 1L) && rows.length == 4)
    assert(rows.map(_._3).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(rows.map(_._4).toSeq == Seq(4, 4, 4, 1)) // tail = 1 token
    assert(rows(0)._5 == "t1 t2 t3 t4" && rows(3)._5 == "t10")
    // overlap: each chunk after the first repeats size-stride=1 token
    assert(rows(1)._5.startsWith("t4 "))
  }

  // ------------------------------------------------------- RangeJoinOps

  test("binnedRangeJoin equals the naive inequality join, any bin width") {
    val pts = (0L until 400L).map(i => (i, i * 13 % 1000)).toDF("pid", "pt")
    val ivs = (0L until 60L).map { i =>
      val s = i * 37 % 950
      (i, s, s + 5 + i % 90)
    }.toDF("ivid", "lo", "hi")
    val naive = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "ivid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L, 1000L, 5000L)) {
      val got = RangeJoinOps.binnedRangeJoin(pts, ivs, "pt", "lo", "hi", w)
        .select("pid", "ivid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("binnedRangeJoin: negative coordinates bin left (floor semantics)") {
    // Pre-epoch timestamps: truncate-toward-zero would merge [-w, 0)
    // into bin 0 and pairs straddling the origin could be missed or
    // doubled. Randomized straddle set vs the naive inequality join.
    val rnd = new scala.util.Random(44)
    val pts = (0L until 200L).map(i => (i, rnd.nextInt(400).toLong - 200))
      .toDF("pid", "pt")
    val ivs = (0L until 50L).map { i =>
      val s = rnd.nextInt(360).toLong - 180
      (i, s, s + 1 + rnd.nextInt(50).toLong)
    }.toDF("ivid", "lo", "hi")
    val naive = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "ivid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 16L, 128L)) {
      val got = RangeJoinOps.binnedRangeJoin(pts, ivs, "pt", "lo", "hi", w)
        .select("pid", "ivid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"binWidth=$w emitted duplicates")
      assert(got.toSet == naive, s"binWidth=$w diverged on negatives")
    }
  }

  test("binnedRangeJoin: null and inverted intervals never match") {
    val pts = Seq(Tuple1(5L), Tuple1(50L)).toDF("pt")
    val ivs = Seq((1L, Some(0L), Some(10L)), (2L, Some(60L), Some(40L)),
      (3L, None, Some(10L))).toDF("ivid", "lo", "hi")
    val got = RangeJoinOps.binnedRangeJoin(pts, ivs, "pt", "lo", "hi", 16L)
      .select("ivid", "pt").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 5L)))
  }

  // ---------------------------------------------------------- SketchOps

  test("KMV: below-k groups are exact; full groups estimate within 4x1/sqrt(k) rel err") {
    val df = (0L until 20000L).map { i =>
      if (i % 2 == 0) ("small", i % 40L) else ("big", i % 5000L)
    }.toDF("g", "v")
    val rows = SketchOps.kmvDistinct(df, Seq("g"), col("v"), 64)
      .select("g", "n_kept", "est_distinct")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("small") == ((20L, 20L))) // 20 distinct (even i % 40) < k: exact
    val (kept, est) = rows("big")
    assert(kept == 64L)
    // true distinct = 2500 (odd i % 5000 hits only odd residues);
    // 1/sqrt(k-2) ~ 12.7%; 4-sigma bound, deterministic data so no flake
    assert(math.abs(est - 2500L) < 2500L * 0.51, s"est=$est")
  }

  test("KMV stays accurate on small consecutive ids (regression: unwrapped affine hash)") {
    // 150 consecutive ids overflowed nothing and wrapped nothing in the
    // original a=1048573 hash — h was monotonic in v and the estimator
    // read ~950. With the wrapping multiplier it must sit near 150.
    val df = (0L until 10000L).map(i => ("g", i % 150L)).toDF("g", "v")
    val est = SketchOps.kmvDistinct(df, Seq("g"), col("v"), 64)
      .select("est_distinct").as[Long].head()
    assert(math.abs(est - 150L) <= 40L, s"est=$est")
  }

  test("KMV estimate is invariant under repartitioning (order-independent merge)") {
    val df = (0L until 9999L).map(i => ("g", i * 31 % 2500)).toDF("g", "v")
    val a = SketchOps.kmvDistinct(df.repartition(1), Seq("g"), col("v"), 32)
      .select("est_distinct").as[Long].head()
    val b = SketchOps.kmvDistinct(df.repartition(17, col("v") % 7), Seq("g"), col("v"), 32)
      .select("est_distinct").as[Long].head()
    assert(a == b)
  }

  // ----------------------------------------------------------- QuotaOps

  test("quotaSample: quotas filled when data allows, capped at stratum size, unknown strata dropped") {
    val df = (0L until 1000L).map(i =>
      (if (i < 700) "a" else if (i < 980) "b" else "c", i)).toDF("lang", "id")
    val got = QuotaOps.quotaSample(df, "lang",
        Map("a" -> 0.5, "b" -> 0.4, "c" -> 0.1), 100L,
        SketchOps.portableHash(col("id")), Seq(col("id")))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 50L) // quota 50, have 700
    assert(got("b") == 40L) // quota 40, have 280
    assert(got("c") == 10L) // quota 10, have 20
    val df2 = df.filter(col("lang") =!= "c")
      .union(Seq(("c", 5000L), ("c", 5001L)).toDF("lang", "id"))
    val capped = QuotaOps.quotaSample(df2, "lang",
        Map("a" -> 0.5, "b" -> 0.4, "c" -> 0.1), 100L,
        SketchOps.portableHash(col("id")), Seq(col("id")))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("c") == 2L) // short stratum contributes everything it has
    // a stratum with no weight entry is excluded entirely
    val noW = QuotaOps.quotaSample(df, "lang", Map("a" -> 0.5), 100L,
      SketchOps.portableHash(col("id")), Seq(col("id")))
    assert(noW.filter(col("lang") =!= "a").count() == 0L)
  }

  // -------------------------------------------------------- SparseSimOps

  test("tfCosinePairs matches a hand-computed cosine; shared-term-only pairs") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta beta gamma"),   // exact dup of 1 -> cosine 1.0
      (3L, "alpha beta delta"),        // partial overlap with 1/2
      (4L, "zeta eta theta"))          // no shared terms -> never paired
      .toDF("id", "txt")
    val got = SparseSimOps.tfCosinePairs(docs, "id", "txt", 0.1, 100L)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-12)
    // doc1 = {alpha:1, beta:2, gamma:1} |v|=sqrt(6); doc3 = {alpha:1, beta:1, delta:1}
    // dot = 1 + 2 = 3; cosine = 3 / (sqrt(6)*sqrt(3))
    val expected13 = 3.0 / (math.sqrt(6.0) * math.sqrt(3.0))
    assert(math.abs(got((1L, 3L)) - expected13) < 1e-12)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("tfCosinePairs: dfCap removes a term from vectors AND norms on both sides") {
    // 'common' appears in all 3 docs; with dfCap=2 it is dropped, making
    // docs 1/2 identical over the remaining vocabulary -> cosine 1.0
    val docs = Seq(
      (1L, "common unique1 shared"),
      (2L, "common unique1 shared"),
      (3L, "common other words")).toDF("id", "txt")
    val capped = SparseSimOps.tfCosinePairs(docs, "id", "txt", 0.99, 2L)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(capped == Set((1L, 2L)))
  }

  // ------------------------------------------------------------ TopKOps

  test("topKByValue equals the window formulation it replaces") {
    val df = (0L until 5000L).map(i =>
      (s"g${i % 7}", i * 131 % 997, i)).toDF("g", "v", "id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(desc("v"), asc("id"))
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("g"), col("rank"), col("v").as("n"), col("id"))
      .as[(String, Int, Long, Long)].collect().toSet
    val got = TopKOps.topKByValue(df, Seq("g"), col("v"), col("id"), 5,
        orderName = "n", tieName = "id")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("topKByValue: short groups keep everything; result is partitioning-invariant") {
    val df = (0L until 300L).map(i => (s"g${i % 100}", i % 13, i)).toDF("g", "v", "id")
    val a = TopKOps.topKByValue(df, Seq("g"), col("v"), col("id"), 5)
      .as[(String, Int, Long, Long)].collect().toSet
    val b = TopKOps.topKByValue(df.repartition(23, col("id") % 11), Seq("g"),
        col("v"), col("id"), 5)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(a == b)
    // 100 groups x 3 rows each, k=5 > 3: all 300 rows survive, ranked
    assert(a.size == 300)
  }

  test("quotaSample is deterministic: same draw on rerun and under repartition") {
    val df = (0L until 500L).map(i => (s"s${i % 3}", i)).toDF("lang", "id")
    def draw(d: org.apache.spark.sql.DataFrame) =
      QuotaOps.quotaSample(d, "lang", Map("s0" -> 0.3, "s1" -> 0.3, "s2" -> 0.4),
          60L, SketchOps.portableHash(col("id")), Seq(col("id")))
        .select("lang", "id").as[(String, Long)].collect().toSet
    assert(draw(df) == draw(df.repartition(13)))
  }

  // ------------------------------------------------------ KmvSketchAgg

  test("KmvSketchAgg: buffer IS the k smallest distinct hashes, sorted, " +
      "partitioning-invariant") {
    val vals = (0L until 5000L).map(_ * 13 % 700)
    val want = vals.distinct
      .map(v => ((v % SketchOps.hashM + SketchOps.hashM) * 123456791L + 7919L)
        % SketchOps.hashM)
      .distinct.sorted.take(32)
    def sketch(parts: Int): Seq[Long] = {
      val agg = udaf(new SketchOps.KmvSketchAgg(32))
      vals.toDF("v").repartition(parts)
        .agg(agg(SketchOps.portableHash(col("v"))))
        .as[Seq[Long]].head()
    }
    assert(sketch(1) == want)
    assert(sketch(11) == want)
  }

  test("o20_stratified_split: exact floor 80/10/10 counts per stratum; " +
      "tiny strata spill to test; assignment is deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o20").toString
    val rows =
      (1L to 10L).map(i => (i, "a")) ++ (11L to 33L).map(i => (i, "b")) ++
        Seq((34L, "c")) ++ Seq((35L, "d"), (36L, "d"))
    rows.toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def draw() = graft.SparkEntry.queries("o20_stratified_split")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = draw()
    assert(got.length == 36 && got.map(_._1).distinct.length == 36)
    val bySplit = got.groupBy(x => (x._2, x._3)).view.mapValues(_.length).toMap
    assert(bySplit.getOrElse(("a", "train"), 0) == 8)
    assert(bySplit.getOrElse(("a", "val"), 0) == 1)
    assert(bySplit.getOrElse(("a", "test"), 0) == 1)
    // n=23: floor boundaries 18 / 2 / 3
    assert(bySplit.getOrElse(("b", "train"), 0) == 18)
    assert(bySplit.getOrElse(("b", "val"), 0) == 2)
    assert(bySplit.getOrElse(("b", "test"), 0) == 3)
    // n=1 -> all test; n=2 -> 1 train 1 test (floor(1.6)=1, floor(1.8)=1)
    assert(bySplit.getOrElse(("c", "test"), 0) == 1 && !bySplit.contains(("c", "train")))
    assert(bySplit.getOrElse(("d", "train"), 0) == 1)
    assert(bySplit.getOrElse(("d", "test"), 0) == 1)
    assert(draw().toSeq == got.toSeq) // deterministic rerun
  }

  test("t_bpe_encode: hand-traced merges — greedy leftmost non-overlap, " +
      "no cross-token-boundary matches, exact compression accounting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // tokens: doc1 [a b a b], doc2 [a b c]. pair counts: (a,b)=3,
    // (b,a)=1, (b,c)=1 -> ranked merges (a,b), (b,a), (b,c).
    Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("t_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc1: (a,b) merges twice -> [ab ab]; "aba b" overlap must NOT merge
    assert(got(1L) == ((4L, 2L, 2L, 500000L)), got(1L))
    // doc2: [ab c]; the later (b,c) merge must not fire on ab's inner b
    assert(got(2L) == ((3L, 2L, 1L, 666666L)), got(2L))
  }

  test("dedup_url_canonical: five messy variants canonicalize together, " +
      "the sixth stays distinct; keep-first keeper") {
    val dir = java.nio.file.Files.createTempDirectory("graft_url").toString
    (0L to 11L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = graft.SparkEntry.queries("dedup_url_canonical")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getBoolean(3),
        r.getLong(4)))
    val byKey = got.map(x => x._1 -> x).toMap
    // group N=0: keys 0..4 share one canonical, keeper 0
    val canon0 = byKey(0L)._2
    assert(canon0 == "https://host.example.com/a/b?id=0", canon0)
    (0L to 4L).foreach { k =>
      assert(byKey(k)._2 == canon0 && byKey(k)._4 == 0L)
      assert(byKey(k)._3 == (k == 0L))
    }
    // key 5 is a different resource, its own keeper
    assert(byKey(5L)._2 == "https://other.example.com/p?id=0")
    assert(byKey(5L)._3 && byKey(5L)._4 == 5L)
    // second group maps to id=1, keeper 6
    assert(byKey(7L)._2 == "https://host.example.com/a/b?id=1")
    assert(byKey(7L)._4 == 6L)
  }

  test("o21_compaction_plan: bins replay the prefix-sum arithmetic; " +
      "every file lands in exactly one bin of its partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_o21").toString
    (1L to 40L).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.SparkEntry.queries("o21_compaction_plan")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // Scala replay of the defined arithmetic
    val target = 134217728L
    val files = (1L to 40L).map(k =>
      (s"p${k % 8}", k, 1000000L + (k * 7919L) % 40000000L))
    val want = files.groupBy(_._1).flatMap { case (p, fs) =>
      val sorted = fs.sortBy(_._2)
      val starts = sorted.scanLeft(0L)(_ + _._3).init
      sorted.zip(starts).groupBy { case (_, st) => st / target }
        .map { case (bin, xs) =>
          (p, bin) -> (xs.size.toLong, xs.map(_._1._3).sum,
            xs.map(_._1._2).min, xs.map(_._1._2).max,
            xs.map(_._1._3).sum * 1000000L / target)
        }
    }
    assert(got == want, s"got $got want $want")
    assert(got.values.map(_._1).sum == 40L) // every file binned once
  }

  test("t_kmv_join_card: below-k sides degrade to exact counts end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvjc").toString
    // A: keys 1..10, each twice (20 rows). B('F'): keys 6..12. inter = 5.
    (1L to 10L).flatMap(k => Seq(k, k)).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (6L to 15L).map(k => (k, if (k <= 12) "F" else "P"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.SparkEntry.queries("t_kmv_join_card")(spark, dir).head()
    val got = (0 until 9).map(i => r.getLong(i))
    // (n_a_rows, est_a, est_b, est_union, n_common, est_inter,
    //  exact_inter, err_ppm, est_join_rows)
    assert(got == Seq(20L, 10L, 7L, 12L, 5L, 5L, 5L, 0L, 10L), got)
  }
}
