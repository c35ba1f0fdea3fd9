package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextFns
import graft.operators.{AudioOps, ImageOps, WerAgg}
import graft.streaming.StreamingRegroup

/** ScalaCheck properties for the pure scalar/agg kernels (SURVEY §5.2). */
object KernelProps extends Properties("graft.kernels") {

  // ------------------------------------------- convertDuration vs model
  property("convertDuration matches an independent H/M/S model") =
    forAll(Gen.choose(0, 99), Gen.choose(0, 59), Gen.choose(0, 59)) {
      (h: Int, m: Int, s: Int) =>
        val str = f"$h%d:$m%02d:$s%02d"
        val secs = h * 3600L + m * 60L + s
        val secOk = TextFns.convertDuration(str, "second").contains(secs.toDouble)
        val hours = TextFns.convertDuration(str, "hour").get
        val hourOk = math.abs(hours - secs / 3600.0) < 1e-4 + 1e-9
        secOk && hourOk
    }

  // ------------------------------------------------ levenshtein laws
  private val words: Gen[Array[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "xy")).map(_.toArray)

  property("levenshtein: identity, symmetry, bounds") =
    forAll(words, words) { (a: Array[String], b: Array[String]) =>
      val d = WerAgg.levenshtein(a, b)
      WerAgg.levenshtein(a, a) == 0 &&
        WerAgg.levenshtein(b, a) == d &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    }

  property("levenshtein: triangle inequality") =
    forAll(words, words, words) {
      (a: Array[String], b: Array[String], c: Array[String]) =>
        WerAgg.levenshtein(a, c) <=
          WerAgg.levenshtein(a, b) + WerAgg.levenshtein(b, c)
    }

  // ---------------------------------------------- winnowing guarantee
  private val alnumStr: Gen[String] =
    Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  property("winnowing: docs sharing a >= w+k-1 char substring share a fingerprint") =
    forAll(alnumStr, alnumStr, alnumStr) { (pre: String, shared0: String, post: String) =>
      // k=5, w=4: guarantee threshold is 8 cleaned chars
      val shared = (shared0 + "qzjxkvwm").take(12)
      val a = TextFns.winnowFingerprints(pre + shared)
      val b = TextFns.winnowFingerprints(shared + post)
      a.toSet.intersect(b.toSet).nonEmpty
    }

  property("winnowing: sorted, distinct, position-shift invariant on whole docs") =
    forAll(alnumStr.suchThat(_.length >= 12)) { (s: String) =>
      val fp = TextFns.winnowFingerprints(s)
      fp == fp.sorted && fp.distinct == fp &&
        TextFns.winnowFingerprints("!! " + s + " ??") == fp // non-alnum stripped
    }

  // ---------------------------------------------- pyLiteral round-trip
  private val pyStr = Gen.alphaNumStr.map(_.take(8))
  property("pyLiteralToJson: flat dicts parse to canonical JSON") =
    forAll(pyStr, Gen.choose(0, 1000)) { (s: String, n: Int) =>
      TextFns.pyLiteralToJson(s"{'k': '$s', 'n': $n}") ==
        s"""{"k":"$s","n":$n}"""
    }

  // -------------------------------------------------- normalize_name
  property("normalizeName: idempotent, no uppercase/space") =
    forAll(Gen.asciiPrintableStr.map(_.take(20))) { (s: String) =>
      val once = TextFns.normalizeName(s)
      TextFns.normalizeName(once) == once &&
        !once.exists(_.isUpper) && !once.contains(" ")
    }

  // ----------------------------------------- wav encode/decode laws
  private val samples: Gen[Array[Float]] =
    Gen.listOf(Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray)

  property("encodePcm16Wav: decode∘encode∘decode∘encode is byte-stable") =
    forAll(samples, Gen.oneOf(8000, 16000, 24000)) { (xs: Array[Float], sr: Int) =>
      // one quantization pass may move values; after it, the pair is exact
      val once = AudioOps.encodePcm16Wav(xs, sr)
      val (decoded, sr2) = AudioOps.decodePcm16Wav(once)
      val twice = AudioOps.encodePcm16Wav(decoded, sr2)
      sr2 == sr && twice.sameElements(once)
    }

  property("encodePcm16Wav: quantization error bounded by half an LSB") =
    forAll(samples) { (raw: Array[Float]) =>
      // clamp into the representable range [-1, 32767/32768]; +1.0 itself
      // saturates to full scale with a whole-LSB error by design
      val xs = raw.map(x => math.max(-1f, math.min(x, 32767f / 32768f)))
      val (decoded, _) = AudioOps.decodePcm16Wav(AudioOps.encodePcm16Wav(xs, 8000))
      decoded.zip(xs).forall { case (d, x) => math.abs(d - x) <= 0.5f / 32768f + 1e-7f }
    }

  // ------------------------------------- streaming regroup == batch fold
  /** Splitting a sentence stream at ANY batch boundaries and folding with
    * StreamingRegroup.advance must equal the single-shot fold — the
    * property that makes the streaming operator trustworthy. */
  private val sentenceSeq: Gen[List[(Int, Int)]] =
    Gen.listOf(Gen.choose(1, 12)).map(_.zipWithIndex.map { case (wc, i) => (i + 1, wc) })
  property("streaming regroup: arbitrary batch splits are fold-invariant") =
    forAll(sentenceSeq, Gen.choose(5, 25), Gen.choose(1, 5)) {
      (sents: List[(Int, Int)], threshold: Int, nSplits: Int) =>
        val evs = sents.map { case (rn, wc) =>
          StreamingRegroup.Sentence("d", rn.toLong, s"s$rn", wc.toLong) }
        val oneShot = StreamingRegroup.advance("d", StreamingRegroup.emptyBuf, evs, threshold)
        val chunks = if (evs.isEmpty) List(Nil) else evs.grouped(
          math.max(1, evs.size / nSplits)).toList
        val folded = chunks.foldLeft(
          (StreamingRegroup.emptyBuf, List.empty[StreamingRegroup.GroupOut])) {
          case ((buf, acc), chunk) =>
            val (b2, out) = StreamingRegroup.advance("d", buf, chunk, threshold)
            (b2, acc ++ out)
        }
        folded._1 == oneShot._1 && folded._2 == oneShot._2
    }

  // --------------------------- tokenizer kernels vs java.util.regex
  // The byte-scan kernels (TokenKernels) claim exact equivalence with
  // the regex forms they replaced; random unicode (including astral
  // code points and case-folding traps) pins it outside Spark.
  private val uniString: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B', '.', '!', '-'),
    1 -> Gen.oneOf('İ', 'ı', 'ß', 'Ǆ', 'ﬁ', 'Ａ', '数', '的', 'é', 'Ỵ'),
    1 -> Gen.choose(0x10000, 0x10FFF).map(cp =>
      new String(Character.toChars(cp)).charAt(0)) // high surrogate alone is
    )).map(_.mkString) // repaired by UTF8String.fromString round-trip

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
  private def arr(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  property("asciiRuns == regexp_extract_all(lower, class) for all classes") =
    forAll(uniString) { s =>
      val low = utf8(s).toLowerCase.toString // the exact lower() Spark applies
      def re(p: String) =
        p.r.findAllIn(low).toSeq
      arr(graft.functions.TokenKernels.asciiRuns(utf8(s), true, 1)) == re("[a-z0-9]+") &&
        arr(graft.functions.TokenKernels.asciiRuns(utf8(s), false, 1)) == re("[a-z]+") &&
        arr(graft.functions.TokenKernels.asciiRuns(utf8(s), false, 3)) == re("[a-z]{3,}")
    }

  property("bpeTokens/bpeCount == the BPE-ish regex") =
    forAll(uniString) { s =>
      val model = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r
        .findAllIn(utf8(s).toString).toSeq // round-trip repairs lone surrogates
      val toks = arr(graft.functions.TokenKernels.bpeTokens(utf8(s)))
      toks == model &&
        graft.functions.TokenKernels.bpeCount(utf8(s)) == model.size
    }

  property("kgrams == the transform/slice/concat_ws shingle model") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "c0", "dd")), Gen.oneOf(2, 3)) {
      (toks, k) =>
        val model = (1 to math.max(toks.size - k + 1, 1))
          .map(j => toks.slice(j - 1, j - 1 + k).mkString(" "))
        val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(utf8).toArray[Any])
        arr(graft.functions.TokenKernels.kgrams(in, k, false)) == model &&
          arr(graft.functions.TokenKernels.kgrams(in, k, true)) == model.distinct
    }

  property("minhashLanes == min-over-shingles of chunked md5 hex slices") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "c0", "dd", "ee1")),
        Gen.oneOf(2, 3), Gen.oneOf(4, 8)) { (toks, k, nh) =>
      val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(utf8).toArray[Any])
      val grams = (1 to math.max(toks.size - k + 1, 1))
        .map(j => toks.slice(j - 1, j - 1 + k).mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(x: String) =
        md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val model = (0 until nh).map { i =>
        grams.map(g => md5hex(s"${i / 4}:$g")
          .substring((i % 4) * 8, (i % 4) * 8 + 8)).min
      }
      arr(graft.functions.TokenKernels.minhashLanes(in, k, nh)) == model
    }

  property("wsWordCount == trim/collapse/split regex pipeline") =
    forAll(uniString) { s =>
      val collapsed = s.replaceAll("\\s+", " ").trim
      val model = if (collapsed.isEmpty) 0 else collapsed.split(" ").length
      graft.functions.TokenKernels.wsWordCount(utf8(s)) == model
    }

  // Stopword-dense text with tricky joins: word-char suffix/prefix kills
  // the \b match ("_the", "athe"), separators restore it, and zh chars
  // embedded mid-ASCII exercise the multi-byte window.
  private val langText: Gen[String] = Gen.listOf(Gen.frequency(
      4 -> Gen.oneOf("the", "der", "la", "les", "的", "不", "und", "que",
        "est", "a", "to", "is", "el", "une", "de"),
      2 -> uniString.map(_.take(8)),
      1 -> Gen.oneOf("_the", "the_", "athe", "the-", "él", "de的le", "了了了")))
    .flatMap(ws => Gen.listOfN(ws.size, Gen.oneOf(" ", "", "-", "\n", "_"))
      .map(seps => ws.zip(seps).map { case (w, sep) => w + sep }.mkString))

  property("langHits == the RE2-semantics regex scans (ASCII \\b via lookarounds)") =
    forAll(langText) { s =>
      // Model = RE2 semantics, which is what DuckDB evaluates: ASCII-only
      // \b, expressed in java.util.regex as explicit [A-Za-z0-9_]
      // lookarounds (Java's own \b is Unicode-aware — see TokenKernels
      // .langHits scaladoc — so the raw pattern is NOT a valid model).
      val model = graft.functions.TextFns.langStopwords.map { case (_, p) =>
        val re2 = p.replace("\\b(", "(?<![A-Za-z0-9_])(")
          .replace(")\\b", ")(?![A-Za-z0-9_])")
        val m = java.util.regex.Pattern.compile(re2).matcher(s)
        var c = 0
        while (m.find()) c += 1
        c
      }
      val got = graft.functions.TokenKernels.langHits(utf8(s))
      (0 until 5).map(got.getInt) == model
    }

  property("tfMap == groupBy-count model, keys in first-occurrence order") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "c0", "ähm", "", "a"))) { toks =>
      val in = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(utf8).toArray[Any])
      val m = graft.functions.TokenKernels.tfMap(in)
      val keys = (0 until m.numElements()).map(i =>
        m.keyArray().getUTF8String(i).toString)
      val vals = (0 until m.numElements()).map(i => m.valueArray().getInt(i))
      keys == toks.distinct &&
        (keys zip vals).forall { case (k, v) => toks.count(_ == k) == v }
    }

  property("simHash == per-token md5 hex-digit-parity vote model") =
    forAll(uniString, Gen.oneOf(8, 16, 32)) { (s, bits) =>
      val toks = arr(graft.functions.TokenKernels.asciiRuns(utf8(s), false, 1))
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = Array.fill(bits)(0)
      toks.foreach { t =>
        val hex = md.digest(t.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        (0 until bits).foreach(i =>
          votes(i) += (hex.charAt(i).toInt % 2) * 2 - 1)
      }
      val model = (0 until bits).map(i =>
        if (votes(i) >= 0) 1L << (bits - 1 - i) else 0L).sum
      graft.functions.TokenKernels.simHash(utf8(s), bits) == model
    }

  // -------------------------------------------------- W3 fold model
  // --------------------------- bounded-buffer aggregator merge laws
  // Partial-aggregation merge order is nondeterministic under real
  // partitioning, so both bounded buffers must be exact set summaries:
  // any partitioning of the input, reduced then merged in any grouping,
  // must equal the single-pass fold.

  private val longs = Gen.nonEmptyListOf(Gen.choose(-50L, 5000L))
  private val splitPoints = Gen.choose(0, 100)

  property("KMV buffer: merge of any split == single-pass fold") =
    forAll(longs, splitPoints, Gen.oneOf(3, 8, 64)) { (vs, cut, k) =>
      val agg = new graft.operators.SketchOps.KmvAgg(k)
      def fold(xs: Seq[Long]) =
        xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val whole = fold(vs)
      val (l, r) = vs.splitAt(cut % (vs.length + 1))
      val merged = agg.merge(fold(l), fold(r))
      val mergedRev = agg.merge(fold(r), fold(l))
      Prop(merged.sameElements(whole)) :| "split==whole" &&
        Prop(mergedRev.sameElements(whole)) :| "merge commutes"
    }

  property("TopK buffer: merge of any split == single-pass fold; ranked correctly") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 1000L))),
        splitPoints, Gen.oneOf(1, 3, 7)) { (vs0, cut, k) =>
      val vs = vs0.distinct // tie column must be unique per contract
      val agg = new graft.operators.TopKOps.TopKAgg(k)
      def fold(xs: Seq[(Long, Long)]) =
        xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val whole = fold(vs)
      val (l, r) = vs.splitAt(cut % (vs.length + 1))
      val merged = agg.merge(fold(l), fold(r))
      // model: sort by (value desc, tie asc), take k, flatten
      val model = vs.sortBy { case (v, t) => (-v, t) }.take(k)
        .flatMap { case (v, t) => Seq(v, t) }.toArray
      Prop(whole.sameElements(model)) :| "fold==model" &&
        Prop(merged.sameElements(model)) :| "merge==model"
    }

  /** Reference fold (process_all.py:305-335) as a tiny model: emitted
    * groups reach threshold; a kept tail is in [threshold/2, threshold);
    * concatenated kept text is a prefix-respecting subsequence. */
  private val wcs = Gen.nonEmptyListOf(Gen.choose(1, 15))
  property("sentence-regroup model: group invariants") =
    forAll(wcs, Gen.choose(5, 30)) { (ws: List[Int], threshold: Int) =>
      var acc = 0
      val groups = List.newBuilder[Int]
      ws.foreach { w =>
        acc += w
        if (acc >= threshold) { groups += acc; acc = 0 }
      }
      val emitted = groups.result()
      val tailKept = acc >= threshold / 2 && acc > 0
      Prop.all(
        Prop(emitted.forall(_ >= threshold)) :| "every emitted group reaches threshold",
        Prop(emitted.sum + (if (tailKept) acc else 0) <= ws.sum) :| "no invented words",
        Prop(!tailKept || acc < threshold) :| "tail below threshold")
    }

  // ---------------------------------------- o13 floor-division identity
  /** Moore–Lewis normalizes a possibly NEGATIVE integer score by doc
    * length with `(x − ((x % d + d) % d)) div d`, relying on the
    * subtracted nonnegative mod making truncating division (Spark `div`,
    * Java `/`) equal floor division (DuckDB `//`). Checked against
    * Math.floorDiv for all sign combinations. */
  property("o13 mod-adjusted truncating division == floorDiv") =
    forAll(Gen.choose(Long.MinValue / 4, Long.MaxValue / 4),
        Gen.choose(1L, 1000000L)) { (x: Long, d: Long) =>
      val adj = x - ((x % d + d) % d)
      adj / d == Math.floorDiv(x, d) && adj % d == 0
    }

  // -------------------------------------------------- RRF fusion laws
  /** List-truncated RRF with k=60 and two top-20 lists: any doc present
    * in BOTH lists outranks any doc present in exactly one — the
    * property CurationSpec asserts on real output, proven here over the
    * whole rank range. */
  property("RRF: two-list membership dominates single-list membership") =
    forAll(Gen.choose(1, 20), Gen.choose(1, 20), Gen.choose(1, 20)) {
      (r1: Int, r2: Int, s: Int) =>
        def c(rank: Int): Long = 1000000000L / (60L + rank)
        c(r1) + c(r2) > c(s)
    }

  // -------------------------------------------- sortable_bits monotone
  /** The ANN top-k tails rank a DOUBLE score through sortable_bits
    * (TopKOps.topKByScore); the encoding must agree with the engines'
    * comparison on every non-NaN pair — a single inversion would
    * silently misrank. Generator covers full-range magnitudes, both
    * signs, subnormals and zeros. */
  private val anyDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1.7e308, 1.7e308),
    Gen.choose(-1.0, 1.0),
    Gen.choose(-1e-300, 1e-300),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.PositiveInfinity, Double.NegativeInfinity))

  property("sortable_bits orders exactly like double comparison") =
    forAll(anyDouble, anyDouble) { (a: Double, b: Double) =>
      val ea = graft.functions.NativeExprs.sortableBitsJvm(a)
      val eb = graft.functions.NativeExprs.sortableBitsJvm(b)
      // a == b under IEEE (covers -0.0 vs 0.0) must key equal; otherwise
      // the key comparison must match the value comparison.
      if (a == b) ea == eb
      else if (a < b) ea < eb
      else ea > eb
    }

  // --------------------------------------------------- vadSegments laws
  private val signal: Gen[Array[Float]] =
    Gen.listOf(Gen.oneOf(0.0f, 0.1f, 0.5f, 1.0f)).map(_.toArray)

  property("vadSegments: segments are disjoint, ordered, in-range, and " +
      "exactly cover the over-threshold frames") =
    forAll(signal, Gen.choose(1, 8), Gen.oneOf(0.5f, 1.5f, 4.0f)) {
      (s: Array[Float], frame: Int, thr: Float) =>
        val segs = AudioOps.vadSegments(s, frame, thr)
        val nf = s.length / frame
        def frameActive(f: Int): Boolean =
          (f * frame until f * frame + frame).map(i => math.abs(s(i))).sum > thr
        val covered = segs.flatMap { case (a, b) => a until b }.toSet
        segs.forall { case (a, b) => a < b && a >= 0 && b <= nf } &&
          segs.sliding(2).forall {
            case Seq((_, e1), (s2, _)) => e1 < s2 // gap between runs
            case _ => true
          } &&
          covered == (0 until nf).filter(frameActive).toSet
    }

  // -------------------------------------------------------- aHash laws
  private val grayImg: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(8, 24)
    h <- Gen.choose(8, 24)
    px <- Gen.listOfN(w * h, Gen.choose(0, 200)).map(_.toArray)
  } yield (w, h, px)

  property("aHash: invariant under uniform brightness shift (no clipping)") =
    forAll(grayImg, Gen.choose(1, 55)) { case ((w, h, px), shift) =>
      ImageOps.aHash(w, h, px) == ImageOps.aHash(w, h, px.map(_ + shift))
    }

  property("aHash halves stay in 32-bit non-negative range") =
    forAll(grayImg) { case (w, h, px) =>
      val (hi, lo) = ImageOps.aHash(w, h, px)
      hi >= 0L && hi <= 0xFFFFFFFFL && lo >= 0L && lo <= 0xFFFFFFFFL
    }

  // --------------------------------------------------------- EWMA laws
  private val cents: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 100000L))

  property("EWMA: final value stays within [min, max] of the inputs and " +
      "the fold equals stepwise advance under any batch split") =
    forAll(cents, Gen.choose(0, 20)) { (vs: List[Long], cut0: Int) =>
      val (n, s, spikes) = graft.operators.EwmaOps.fold(vs.iterator)
      val bounds = vs.isEmpty ||
        (s >= vs.min - 1 && s <= vs.max) // -1: floor division slack
      val cut = math.min(cut0, vs.length)
      val st1 = vs.take(cut).foldLeft(graft.operators.EwmaOps.emptySt)(
        graft.operators.EwmaOps.step)
      val st2 = vs.drop(cut).foldLeft(st1)(graft.operators.EwmaOps.step)
      bounds && (st2.n, st2.s, st2.spikes) == ((n, s, spikes))
    }
}
