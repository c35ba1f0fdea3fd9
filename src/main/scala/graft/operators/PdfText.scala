package graft.operators

import java.nio.charset.StandardCharsets

/** Native PDF text extraction (SURVEY §2 S10; reference:
  * `/root/reference/tts_data_pipeline/pre_processing/process_all.py:265-279`,
  * PyMuPDF per-page `get_text` concat) — pure JDK, no PDF library in
  * this offline container (the S11/Mp3Layer3 precedent: implement the
  * published format directly rather than leave a stub standing).
  *
  * What the format requires (PDF 32000-1:2008):
  *   - §7.3.8 stream objects: `<<dict>> stream\r?\n data endstream`,
  *     data length from /Length when direct;
  *   - §7.4.4 FlateDecode: zlib/deflate — `java.util.zip.Inflater`
  *     IS the reference implementation of that filter;
  *   - §9.4 text objects: `BT ... ET` blocks whose text-showing
  *     operators are `Tj` (string), `TJ` (array of strings and kern
  *     numbers), `'` and `"` (next-line show); line-moves `Td`, `TD`,
  *     `T*` (and the `'`/`"` implicit next-line) break lines;
  *   - §7.3.4 string syntax: literal `( )` with nesting and
  *     `\n \r \t \b \f \( \) \\ \ooo` escapes plus
  *     backslash-newline continuation; hex `< >` strings.
  *
  * Deliberate scope (documented, not hidden):
  *   - Objects are found by LINEAR SCAN, not via the xref table: every
  *     content stream is a top-level `N G obj` (streams cannot live
  *     inside PDF 1.5 object streams, §7.5.7), so the scan sees them
  *     all and survives the broken/hybrid xrefs real-world PDFs carry.
  *   - String bytes decode as Latin-1 (byte-preserving) — exact for
  *     standard simple-encoding fonts; composite/CID (Type0) fonts
  *     would need the font's ToUnicode CMap and emit garbage here, as
  *     does any ENCRYPTED document. That boundary stays at the
  *     [[graft.pipeline.Externals]] seam: production corpora with CID
  *     fonts bind a full library there.
  *   - Only the identity filter and /FlateDecode are decoded; streams
  *     under image/other filters (DCTDecode etc.) are skipped — they
  *     carry no text operators.
  *
  * Page/line assembly mirrors the reference's per-page concat: one
  * line per text line (broken at Td, TD, T-star, and the quote shows),
  * pages in file order, blank-line separated — then the pipeline's
  * sentence tokenizer re-segments anyway (PreprocessPipeline).
  */
object PdfText {

  /** Text of every BT/ET block of every content stream, file order.
    * Never throws on malformed input: unparseable objects/streams are
    * skipped (an ingest gate wants "best text or empty", not an
    * executor-killing exception — the IoOps quarantine discipline). */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) return ""
    val pages = streams(bytes).iterator
      .map(decode)
      .filter(containsTextOps)
      .map(contentText)
      .filter(_.nonEmpty)
      .toSeq
    pages.mkString("\n\n")
  }

  // ------------------------------------------------------ object scan

  /** (dict-text, raw-stream-bytes) for every `<<...>> stream` object.
    * Balanced `<<`/`>>` counting delimits the dict; /Length (direct
    * ints only) sizes the data, else the next `endstream` keyword. */
  private def streams(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.Buffer[(String, Array[Byte])]()
    var i = 0
    while (i >= 0 && i < b.length) {
      i = indexOf(b, "<<", i)
      if (i >= 0) {
        // balance << against >>
        var depth = 0
        var j = i
        var end = -1
        while (end < 0 && j < b.length - 1) {
          if (b(j) == '<' && b(j + 1) == '<') { depth += 1; j += 2 }
          else if (b(j) == '>' && b(j + 1) == '>') {
            depth -= 1; j += 2
            if (depth == 0) end = j
          } else j += 1
        }
        if (end < 0) i = -1
        else {
          val dict = new String(b, i, end - i, StandardCharsets.ISO_8859_1)
          var k = end
          while (k < b.length && (b(k) == ' ' || b(k) == '\r' || b(k) == '\n' ||
            b(k) == '\t')) k += 1
          if (k + 6 <= b.length &&
              new String(b, k, 6, StandardCharsets.ISO_8859_1) == "stream") {
            var d = k + 6
            if (d < b.length && b(d) == '\r') d += 1
            if (d < b.length && b(d) == '\n') d += 1
            val len = directLength(dict)
            val stop = len match {
              case Some(n) if d + n <= b.length => d + n
              case _ =>
                val e = indexOf(b, "endstream", d)
                if (e < 0) b.length else e
            }
            out += ((dict, java.util.Arrays.copyOfRange(b, d, stop)))
            i = stop
          } else i = end
        }
      }
    }
    out.toSeq
  }

  // (?!\d) pins the capture at the full number — without it the engine
  // backtracks `/Length 12 0 R` to capture "1" just to satisfy the
  // indirect-reference lookahead; with both, an indirect /Length finds
  // no match and the endstream-keyword fallback sizes the data.
  private val LenRe = """/Length\s+(\d+)(?!\d)(?!\s*\d+\s+R)""".r
  private def directLength(dict: String): Option[Int] =
    LenRe.findFirstMatchIn(dict).map(_.group(1).toInt)

  private def indexOf(b: Array[Byte], s: String, from: Int): Int = {
    val pat = s.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    while (i <= b.length - pat.length) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  // --------------------------------------------------------- filters

  /** Identity or FlateDecode; anything else (or inflate failure) →
    * empty. (dict, data) → decoded bytes. */
  private def decode(s: (String, Array[Byte])): Array[Byte] = {
    val (dict, data) = s
    if (!dict.contains("/Filter")) data
    else if (dict.contains("/FlateDecode")) inflate(data)
    else Array.emptyByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return Array.emptyByteArray
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  private def containsTextOps(c: Array[Byte]): Boolean =
    indexOf(c, "BT", 0) >= 0

  // ------------------------------------------- content-stream scanner

  /** One pass over a decoded content stream: collect shown strings in
    * operator order, breaking lines on Td/TD/T* and before '/" shows. */
  private def contentText(c: Array[Byte]): String = {
    val s = new String(c, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    // pending[] = string operands seen since the last operator
    val pending = scala.collection.mutable.Buffer[String]()
    var inText = false
    var i = 0
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '(' =>
          val (str, ni) = literalString(s, i)
          pending += str; i = ni
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val (str, ni) = hexString(s, i)
          pending += str; i = ni
        case '<' => // dict-in-stream (inline image props): skip the <<
          i += 2
        case '%' => // comment to EOL (§7.2.4)
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case c0 if c0.isLetter || c0 == '\'' || c0 == '"' || c0 == '*' =>
          val j = {
            var k = i
            while (k < s.length && !" \t\r\n()<>[]/%".contains(s.charAt(k))) k += 1
            k
          }
          s.substring(i, j) match {
            case "BT" => inText = true; pending.clear()
            case "ET" => inText = false; pending.clear()
            case "Tj" if inText =>
              pending.foreach(sb.append); pending.clear()
            case "TJ" if inText =>
              // array elements were pushed in order; kern numbers were
              // skipped by the tokenizer, so pending IS the text run
              pending.foreach(sb.append); pending.clear()
            case "'" | "\"" if inText =>
              newline(); pending.foreach(sb.append); pending.clear()
            case "Td" | "TD" | "T*" if inText =>
              newline(); pending.clear()
            case _ => pending.clear() // any other operator consumes operands
          }
          i = j
        case _ => i += 1 // numbers, delimiters, whitespace, [ ]
      }
    }
    sb.toString.trim
  }

  /** Literal string at s(i) == '(' — returns (decoded, index-after).
    * Handles nesting, the octal/char escapes, and backslash-newline
    * continuation (§7.3.4.2). */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => // continuation: \CR or \CRLF
              i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' &&
                s.charAt(i) <= '7') { v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1 }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other); i += 2 // §7.3.4.2: ignore the \
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  /** Hex string at s(i) == '<' — returns (decoded, index-after). Odd
    * digit count pads a trailing 0 (§7.3.4.3). */
  private def hexString(s: String, start: Int): (String, Int) = {
    var i = start + 1
    val hex = new StringBuilder
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
        hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val sb = new StringBuilder
    var j = 0
    while (j < hex.length) {
      sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (sb.toString, i + 1)
  }
}
