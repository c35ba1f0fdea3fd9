package graft.tools

import java.nio.file.{Files, Paths}

/** Ad-hoc real-world probe for the PDF extractor: run PdfText over the
  * container's two genuine PDFs (a TeX-built manual and a DocBook/FO
  * one) and print per-page stats plus a text sample — the validation
  * harness behind the r13 word-gap-kern decision and the r14
  * /Encoding (Annex D + /Differences) decode path. Usage:
  * `sbt "runMain graft.tools.PdfProbe [path.pdf ...]"`. */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    // the forked JVM's default charset may be ASCII — curly quotes and
    // dashes would print as '?', which reads like a decode bug
    val out = new java.io.PrintStream(System.out, true, "UTF-8")
    System.setOut(out)
    val paths =
      if (args.nonEmpty) args.toSeq
      else Seq("/usr/share/doc/libtasn1-doc/libtasn1.pdf",
        "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf")
    for (p <- paths if Files.exists(Paths.get(p))) {
      val bytes = Files.readAllBytes(Paths.get(p))
      val t0 = System.nanoTime()
      val text = graft.operators.PdfText.extract(bytes)
      val ms = (System.nanoTime() - t0) / 1e6
      val pages = text.split("\n\n").length
      val nonAscii = text.count(_ > 127)
      val repl = text.count(c => c >= 0x80 && c <= 0x9F) // C1 = mis-decode
      println(f"== $p: ${bytes.length}%,d bytes -> ${text.length}%,d chars, " +
        f"~$pages pages, $nonAscii non-ascii, $repl C1-control, $ms%.0f ms")
      println(text.take(600))
      println("  ...")
      println(text.slice(text.length / 2, text.length / 2 + 400))
    }
  }
}
