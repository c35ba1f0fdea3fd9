package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextFns
import graft.operators.WerAgg

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

  // -------------------------------------------------- W3 fold model
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
}
