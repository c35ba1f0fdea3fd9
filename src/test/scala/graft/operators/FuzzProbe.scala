package graft.operators

import java.nio.charset.StandardCharsets

/** One-off large-budget fuzz of the PdfText never-throws contract
  * (r15): same corruption grammar as the seeded 1500-case spec test,
  * fresh seed, 50k iterations. A scratch stress probe, not a CI test —
  * run via `sbt "Test/runMain graft.operators.FuzzProbe [iters]"`.
  * Receipt (r15, seed 20260817): 50000/50000 clean in 30.9 s
  * (1618 docs/s single-threaded) — no throw across the full base set
  * including the V5-encrypted, predictor'd, and predictor'd-ObjStm
  * documents. */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(50000)
    val rnd = new scala.util.Random(20260817L)
    val hello = "BT (hello world) Tj ET"
    def cidPdf(ops: String): Array[Byte] = PdfFixtures.assemble(Seq(
      PdfFixtures.textObj(1, "<</Type /Catalog /Pages 2 0 R>>"),
      PdfFixtures.textObj(2, "<</Type /Pages /Kids [3 0 R] /Count 1>>"),
      PdfFixtures.textObj(3, "<</Type /Page /Parent 2 0 R /Resources " +
        "<</Font <</F1 5 0 R>>>> /Contents 4 0 R>>"),
      PdfFixtures.streamObj(4, ops.getBytes(StandardCharsets.ISO_8859_1),
        compress = false),
      PdfFixtures.textObj(5, "<</Type /Font /Subtype /Type0>>")))
    val bases: IndexedSeq[Array[Byte]] = IndexedSeq(
      PdfFixtures.makePdf(Seq(hello), compress = true),
      PdfFixtures.makePdf(Seq(hello, "BT (p2) Tj ET"), compress = false),
      cidPdf("BT /F1 12 Tf <00010002> Tj ET"),
      PdfFixtures.encryptedPdf("BT (x) Tj ET", "aes"),
      PdfFixtures.encryptedPdf("BT (x) Tj ET", "rc4"),
      PdfFixtures.encryptedPdfV5("BT (x) Tj ET"),
      PdfFixtures.makePdfEnc(Seq(hello),
        raw => (" /Filter /LZWDecode", PdfFixtures.lzwEncode(raw))),
      PdfFixtures.makePdfEnc(Seq(hello),
        raw => (" /Filter /FlateDecode /DecodeParms <</Predictor 15 /Columns 7>>",
          PdfFixtures.deflate(
            PdfFixtures.pngPredictEncode(raw, 7, filterForRow = _ % 5)))),
      PdfFixtures.makePdfEnc(Seq(hello),
        raw => (" /Filter /LZWDecode /DecodeParms <</Predictor 2 /Columns 5>>",
          PdfFixtures.lzwEncode(PdfFixtures.tiffPredictEncode(raw, 5)))),
      PdfFixtures.assemble(Seq(
        PdfFixtures.objStmObj(10, Seq(
          1 -> "<</Type /Catalog /Pages 2 0 R>>",
          2 -> "<</Type /Pages /Kids [3 0 R] /Count 1>>",
          3 -> "<</Type /Page /Parent 2 0 R /Contents 4 0 R>>")),
        PdfFixtures.streamObj(4,
          "BT (objstm) Tj ET".getBytes(StandardCharsets.ISO_8859_1),
          compress = true))),
      PdfFixtures.assemble(Seq(
        PdfFixtures.objStmObj(10, Seq(
          1 -> "<</Type /Catalog /Pages 2 0 R>>",
          2 -> "<</Type /Pages /Kids [3 0 R] /Count 1>>",
          3 -> "<</Type /Page /Parent 2 0 R /Contents 4 0 R>>"),
          pngPredictorColumns = 6),
        PdfFixtures.streamObj(4,
          "BT (predstm) Tj ET".getBytes(StandardCharsets.ISO_8859_1),
          compress = true))))
    var done = 0
    val t0 = System.nanoTime()
    for (iter <- 1 to iters) {
      val base = bases(rnd.nextInt(bases.size))
      val b = java.util.Arrays.copyOf(base, base.length)
      try {
        rnd.nextInt(3) match {
          case 0 =>
            for (_ <- 0 to rnd.nextInt(8)) {
              val i = rnd.nextInt(b.length)
              b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
            }
            PdfText.extract(b)
          case 1 =>
            PdfText.extract(java.util.Arrays.copyOfRange(b, 0, rnd.nextInt(b.length)))
          case 2 =>
            val other = bases(rnd.nextInt(bases.size))
            val from = rnd.nextInt(other.length)
            val len = math.min(rnd.nextInt(200), other.length - from)
            val at = rnd.nextInt(b.length)
            val spliced = java.util.Arrays.copyOfRange(b, 0, at) ++
              java.util.Arrays.copyOfRange(other, from, from + len) ++
              java.util.Arrays.copyOfRange(b, at, b.length)
            PdfText.extract(spliced)
        }
        done += 1
      } catch {
        case e: Throwable =>
          println(s"[fuzz] THROW at iter $iter: ${e.getClass.getName}: ${e.getMessage}")
          throw e
      }
      if (iter % 10000 == 0) println(s"[fuzz] $iter ok")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[fuzz] $done/$iters clean in $dt%.1f s (${done / dt}%.0f docs/s)")
  }
}
