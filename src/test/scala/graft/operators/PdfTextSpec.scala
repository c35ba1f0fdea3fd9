package graft.operators

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** PdfText (S10) against STRUCTURALLY VALID PDF documents built by the
  * test itself — header, catalog/pages/page/font objects, content
  * stream, xref table with computed byte offsets, trailer — so the
  * extractor is exercised on the real container format, not on a
  * convenient fragment. Covers: uncompressed and FlateDecode'd content
  * streams, literal-string escapes and nesting, octal escapes, hex
  * strings, TJ arrays with kern numbers, line-break operators, the
  * indirect-/Length fallback, multi-page order, and malformed-input
  * hardening (never throws).
  */
class PdfTextSpec extends AnyFunSuite {

  import PdfFixtures.makePdf

  private val hello =
    "BT /F1 12 Tf 72 712 Td (Hello World) Tj ET"

  test("uncompressed content stream in a valid single-page PDF") {
    assert(PdfText.extract(makePdf(Seq(hello), compress = false)) ==
      "Hello World")
  }

  test("FlateDecode content stream (Inflater path)") {
    assert(PdfText.extract(makePdf(Seq(hello), compress = true)) ==
      "Hello World")
  }

  test("indirect /Length falls back to the endstream keyword") {
    assert(PdfText.extract(
      makePdf(Seq(hello), compress = true, indirectLength = true)) ==
      "Hello World")
  }

  test("literal-string escapes, nesting, and octal codes") {
    val ops = """BT /F1 12 Tf (a\(b\)c) Tj (nested (parens) ok) Tj (\101\102) Tj ET"""
    assert(PdfText.extract(makePdf(Seq(ops), compress = true)) ==
      "a(b)cnested (parens) okAB")
  }

  test("hex strings decode, odd digit count pads") {
    // 48 65 6C 6C 6F = Hello ; <4 9> with odd nibble count -> 0x49 = I
    val ops = "BT <48656C6C6F> Tj <49> Tj ET"
    assert(PdfText.extract(makePdf(Seq(ops), compress = false)) == "HelloI")
  }

  test("TJ arrays show strings in order, kern numbers are positioning") {
    val ops = "BT /F1 12 Tf [(Wor) -120 (ld) 88 (!)] TJ ET"
    assert(PdfText.extract(makePdf(Seq(ops), compress = true)) == "World!")
  }

  test("Td/TD/T* and quote operators break lines") {
    val ops = "BT /F1 12 Tf (line one) Tj 0 -14 Td (line two) Tj T* (line three) ' ET"
    val got = PdfText.extract(makePdf(Seq(ops), compress = true))
    assert(got == "line one\nline two\nline three", got)
  }

  test("multi-page documents concatenate pages in file order") {
    val p1 = "BT (page one) Tj ET"
    val p2 = "BT (page two) Tj ET"
    val got = PdfText.extract(makePdf(Seq(p1, p2), compress = true))
    assert(got == "page one\n\npage two", got)
  }

  test("text outside BT/ET and non-show operands are not emitted") {
    // the (Ignored) string is an operand of a non-show operator; the
    // second stream carries no BT at all (e.g. a graphics-only page)
    val ops = "(Ignored) Tf BT (Shown) Tj ET"
    val gfx = "0 0 612 792 re f"
    val got = PdfText.extract(makePdf(Seq(ops, gfx), compress = false))
    assert(got == "Shown", got)
  }

  test("malformed inputs never throw") {
    assert(PdfText.extract(null) == "")
    assert(PdfText.extract(Array.emptyByteArray) == "")
    assert(PdfText.extract("not a pdf at all".getBytes) == "")
    // valid header, truncated mid-stream
    val whole = makePdf(Seq(hello), compress = true)
    for (cut <- Seq(10, whole.length / 2, whole.length - 5)) {
      val t = java.util.Arrays.copyOfRange(whole, 0, cut)
      PdfText.extract(t) // must not throw; content may be partial/empty
    }
    // stream that claims FlateDecode but holds junk
    val junk = ("%PDF-1.4\n1 0 obj\n<</Length 8 /Filter /FlateDecode>>\n" +
      "stream\nZZZZZZZZ\nendstream\nendobj\n").getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(junk) == "")
  }
}
