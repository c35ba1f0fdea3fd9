package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Annex D tables to values cross-checked OUTSIDE this repo
  * (r14): winAnsi was diffed code-by-code against an independent
  * CP1252 codec and macRoman against an independent Mac OS Roman
  * codec, matching everywhere except the documented Annex D
  * deviations asserted below. A transcription slip in the 700-line
  * table file would fail here, not in a crawled corpus. */
class PdfEncodingsSpec extends AnyFunSuite {

  private def cp(t: Array[String], code: Int): Option[Seq[Int]] =
    Option(t(code)).map(_.map(_.toInt))

  test("winAnsi matches CP1252 on the 0x80-0x9F punctuation block") {
    val expect = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    for ((code, u) <- expect)
      assert(cp(PdfEncodings.winAnsi, code).contains(Seq(u)),
        f"winAnsi 0x$code%02X")
    // CP1252 holes stay holes
    for (code <- Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D, 0x7F) ++ (0 until 0x20))
      assert(PdfEncodings.winAnsi(code) == null, f"winAnsi hole 0x$code%02X")
  }

  test("winAnsi: Latin-1 identity at 0xA1-0xFF; Annex D space/hyphen deviations") {
    for (code <- 0xA1 to 0xFF if code != 0xAD)
      assert(cp(PdfEncodings.winAnsi, code).contains(Seq(code)),
        f"winAnsi 0x$code%02X should be Latin-1 identity")
    // the two deliberate deviations from CP1252 (Annex D lists the
    // same glyph at both codes): 0xA0 -> space, 0xAD -> hyphen
    assert(PdfEncodings.winAnsi(0xA0) == " ")
    assert(PdfEncodings.winAnsi(0xAD) == "-")
  }

  test("macRoman matches the Apple layout with the Annex D/AGL deviations") {
    val expect = Map(
      0x8E -> 0x00E9, 0xA5 -> 0x2022, 0xAA -> 0x2122, 0xAD -> 0x2260,
      0xB0 -> 0x221E, 0xB9 -> 0x03C0, 0xC5 -> 0x2248, 0xC6 -> 0x2206,
      0xCE -> 0x0152, 0xD0 -> 0x2013, 0xD1 -> 0x2014, 0xD2 -> 0x201C,
      0xD4 -> 0x2018, 0xDE -> 0xFB01, 0xDF -> 0xFB02, 0xF5 -> 0x0131,
      0xFF -> 0x02C7)
    for ((code, u) <- expect)
      assert(cp(PdfEncodings.macRoman, code).contains(Seq(u)),
        f"macRoman 0x$code%02X")
    // deviations from the Apple codec, all deliberate:
    assert(PdfEncodings.macRoman(0xBD) == "Ω") // AGL Omega = OHM SIGN
    assert(PdfEncodings.macRoman(0xCA) == " ")      // Annex D: space, not nbsp
    assert(PdfEncodings.macRoman(0xDB) == "¤") // Annex D: currency, not Euro
    assert(PdfEncodings.macRoman(0xF0) == null)     // Apple logo: undefined
  }

  test("standard: the famous non-ASCII positions") {
    val expect = Map(
      0x27 -> 0x2019, 0x60 -> 0x2018, 0xA4 -> 0x2044, 0xA9 -> 0x0027,
      0xAE -> 0xFB01, 0xAF -> 0xFB02, 0xB1 -> 0x2013, 0xD0 -> 0x2014,
      0xE1 -> 0x00C6, 0xF8 -> 0x0142, 0xFB -> 0x00DF)
    for ((code, u) <- expect)
      assert(cp(PdfEncodings.standard, code).contains(Seq(u)),
        f"standard 0x$code%02X")
    // Standard leaves the 0x80-0xA0 block and these high codes empty
    for (code <- Seq(0x80, 0x90, 0xA0, 0xB0, 0xB5, 0xBE, 0xC0, 0xC9,
        0xCC, 0xD1, 0xFF))
      assert(PdfEncodings.standard(code) == null, f"standard hole 0x$code%02X")
  }

  test("ASCII letters/digits are identity in all three tables") {
    for (t <- Seq(PdfEncodings.standard, PdfEncodings.winAnsi,
        PdfEncodings.macRoman); c <- (0x30 to 0x39) ++ (0x41 to 0x5A) ++
        (0x61 to 0x7A))
      assert(t(c) == c.toChar.toString, f"0x$c%02X")
  }

  test("glyphText: AGL names, uni/u algorithmic forms, suffix rule, unknowns") {
    assert(PdfEncodings.glyphText("emdash").contains("—"))
    assert(PdfEncodings.glyphText("ffi").contains("ﬃ"))
    assert(PdfEncodings.glyphText("uni0142").contains("ł"))
    assert(PdfEncodings.glyphText("uni00660069").contains("fi")) // 2 groups
    assert(PdfEncodings.glyphText("u1F600").contains(new String(
      Character.toChars(0x1F600))))
    assert(PdfEncodings.glyphText("a.sc").contains("a")) // suffix stripped
    assert(PdfEncodings.glyphText("g42").isEmpty)   // subset-private
    assert(PdfEncodings.glyphText("uniD800").isEmpty) // surrogate barred
  }
}
