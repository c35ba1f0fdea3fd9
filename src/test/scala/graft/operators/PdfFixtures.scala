package graft.operators

import java.nio.charset.StandardCharsets

/** Builds STRUCTURALLY VALID minimal PDFs for tests — header,
  * catalog/pages/page/font objects, per-page content streams
  * (optionally FlateDecode'd), an xref table with computed byte
  * offsets, and a trailer — so PdfText and the pipeline seam are
  * exercised on the real container format, not a fragment. */
object PdfFixtures {

  /** Each element of `contentOps` becomes one page's content stream. */
  def makePdf(contentOps: Seq[String], compress: Boolean,
      indirectLength: Boolean = false): Array[Byte] = {
    val n = contentOps.size
    val objs = scala.collection.mutable.Buffer[(Int, Array[Byte])]()
    def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    objs += 1 -> bytes(s"<</Type /Catalog /Pages 2 0 R>>")
    objs += 2 -> bytes(s"<</Type /Pages /Kids [$kids] /Count $n>>")
    for (i <- 0 until n)
      objs += (3 + i) -> bytes(
        s"<</Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources <</Font <</F1 ${3 + 2 * n} 0 R>>>> " +
          s"/Contents ${3 + n + i} 0 R>>")
    var nextObj = 4 + 2 * n
    for (i <- 0 until n) {
      val raw = bytes(contentOps(i))
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      val lenTok =
        if (indirectLength) { val o = nextObj; nextObj += 1; s"$o 0 R" }
        else data.length.toString
      val head = bytes(s"<</Length $lenTok$filter>>\nstream\n")
      val tail = bytes("\nendstream")
      objs += (3 + n + i) -> (head ++ data ++ tail)
      if (indirectLength)
        objs += (nextObj - 1) -> bytes(data.length.toString)
    }
    objs += (3 + 2 * n) -> bytes(
      "<</Type /Font /Subtype /Type1 /BaseFont /Helvetica>>")

    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objs.sortBy(_._1).foreach { case (num, body) =>
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n")); out.write(body); out.write(bytes("\nendobj\n"))
    }
    val xref = out.size()
    val maxObj = objs.map(_._1).max
    out.write(bytes(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n"))
    for (num <- 1 to maxObj)
      out.write(bytes(f"${offsets(num)}%010d 00000 n \n"))
    out.write(bytes(
      s"trailer\n<</Size ${maxObj + 1} /Root 1 0 R>>\nstartxref\n$xref\n%%EOF\n"))
    out.toByteArray
  }

  def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
