package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData,
  GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-written tokenizer kernels replacing the java.util.regex hot paths
  * (`regexp_extract_all(lower(text), '[a-z0-9]+', 0)` and the BPE-ish
  * `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` pattern). Tokenization is the single
  * largest CPU term of the dedup/text-quality surface — every MinHash
  * shingle, SimHash vote, tf term and token count starts here — and a
  * regex engine pays NFA bookkeeping per char for what is a one-pass byte
  * scan. Semantics are EXACTLY the regex forms' (the DuckDB oracles keep
  * the regex SQL, so oracle-exactness is the equivalence proof; a
  * property test additionally pins kernel == regex on adversarial
  * unicode input):
  *
  *   - [[TokenKernels.asciiRuns]]: maximal runs of [a-z0-9] (or [a-z])
  *     bytes in `lower(s)`, lowercased by the SAME call Spark's `lower`
  *     makes (UTF8String.toLowerCase). Multi-byte UTF-8 units all have
  *     the high bit set, so they can never join an ASCII run — a byte
  *     scan IS the per-code-point regex scan for this char class. A
  *     `minLen` of n reproduces `[a-z]{n,}`: regex greed makes every
  *     match a maximal run, so the quantifier is a run-length filter.
  *   - [[TokenKernels.bpeTokens]]/[[TokenKernels.bpeCount]]: letter runs,
  *     single digits, single non-space-non-alnum CODE POINTS (multi-byte
  *     UTF-8 sequences step as one token, matching java.util.regex and
  *     RE2 code-point semantics; \s here is ASCII whitespace in both
  *     engines). bpeCount never materializes the token array — token
  *     counting (w7/w8/t_length_stats/pipe packing) only needs the int.
  *
  * All exposed as codegen'd expressions (registered in GraftExtensions):
  * whole-stage codegen calls the static kernel directly — no UDF
  * encoder round-trip, no regex compilation per task.
  */
object TokenKernels {

  private def inRun(b: Byte, digits: Boolean): Boolean =
    (b >= 'a' && b <= 'z') || (digits && b >= '0' && b <= '9')

  /** Maximal [a-z0-9]+ (withDigits) / [a-z]+ runs of length >= minLen in
    * lower(s). Token UTF8Strings share the lowered string's byte array —
    * no per-token copy. */
  def asciiRuns(s0: UTF8String, withDigits: Boolean, minLen: Int): ArrayData = {
    val s = s0.toLowerCase
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](math.min(n >> 2, 64) + 4)
    var i = 0
    while (i < n) {
      if (inRun(b(i), withDigits)) {
        val start = i
        i += 1
        while (i < n && inRun(b(i), withDigits)) i += 1
        if (i - start >= minLen) out.add(UTF8String.fromBytes(b, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** UTF-8 sequence length from its leading byte (1 for ASCII and — for
    * robustness on malformed input — for stray continuation bytes). */
  private def seqLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else if ((b & 0xF8) == 0xF0) 4
    else 1

  /** Tokens of `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` over the raw (NOT
    * lowered) string. */
  def bpeTokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](math.min(n >> 1, 128) + 4)
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isLetter(c)) {
        val start = i
        i += 1
        while (i < n && isLetter(b(i))) i += 1
        out.add(UTF8String.fromBytes(b, start, i - start))
      } else if (isDigit(c)) {
        out.add(UTF8String.fromBytes(b, i, 1)); i += 1
      } else if (isAsciiWs(c)) {
        i += 1
      } else {
        val len = math.min(seqLen(c), n - i)
        out.add(UTF8String.fromBytes(b, i, len)); i += len
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** size(bpeTokens(s)) without materializing the array. */
  def bpeCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var cnt = 0
    while (i < n) {
      val c = b(i)
      if (isLetter(c)) {
        cnt += 1; i += 1
        while (i < n && isLetter(b(i))) i += 1
      } else if (isDigit(c)) { cnt += 1; i += 1 }
      else if (isAsciiWs(c)) i += 1
      else { cnt += 1; i += math.min(seqLen(c), n - i) }
    }
    cnt
  }

  /** Space-joined k-grams over a token array, with the degenerate
    * >= 1-gram convention of the dedup family (a doc with fewer
    * than k tokens yields ONE gram: the clipped join of what it has, ""
    * when empty) — the convention every dedup oracle replays. One pass,
    * no interpreted lambda: the transform(sequence, slice, concat_ws)
    * HOF form this replaces re-evaluated its interpreted lambda per
    * gram. `distinct` keeps first occurrences (array_distinct order). */
  def kgrams(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    val out = math.max(n - k + 1, 1)
    val space = UTF8String.fromString(" ")
    val res = new java.util.ArrayList[UTF8String](out)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var j = 0
    while (j < out) {
      val m = math.min(k, n - j)
      val parts = new Array[UTF8String](math.max(2 * m - 1, 0))
      var i = 0
      while (i < m) {
        if (i > 0) parts(2 * i - 1) = space
        parts(2 * i) = toks.getUTF8String(j + i)
        i += 1
      }
      val g = if (m <= 0) UTF8String.EMPTY_UTF8 else UTF8String.concat(parts: _*)
      if (seen == null || seen.add(g)) res.add(g)
      j += 1
    }
    new GenericArrayData(res.toArray.asInstanceOf[Array[Any]])
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".getBytes

  /** Row-local MinHash lanes: numHashes 8-hex-char lane minima over the
    * k-gram shingles of `toks`, in the chunked-md5 family of the batch
    * and streaming dedup paths — lane i is min over shingles of hex
    * chars [(i%4)*8, +8) of md5('<i/4>:<shingle>'), four lanes per
    * digest. Replaces the exploded form (one row per shingle, flat md5
    * columns, per-doc min(string) SortAggregate): lane minima are
    * per-DOCUMENT facts, so the explode shuffled ~shingle-count rows per
    * doc through a variable-width sort aggregate for values the row
    * already owned. One md5 call per (digest, shingle), minima tracked
    * as the digest's RAW 4 bytes (hex encoding is order-preserving per
    * byte, so unsigned byte comparison == the oracle's lexicographic
    * hex-string min), hex-encoded once per winning lane. */
  def minhashLanes(toks: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val grams = kgrams(toks, k, distinct = false)
    val nDigests = (numHashes + 3) / 4
    val mins = new Array[Array[Byte]](numHashes)
    val md = md5Local.get()
    var g = 0
    val nGrams = grams.numElements()
    while (g < nGrams) {
      val gramBytes = grams.getUTF8String(g).getBytes
      var d = 0
      while (d < nDigests) {
        md.reset()
        md.update(('0' + d).toByte) // d < 10 always: numHashes <= 36
        md.update(':'.toByte)
        md.update(gramBytes)
        val digest = md.digest()
        var lane = d * 4
        val laneEnd = math.min(lane + 4, numHashes)
        while (lane < laneEnd) {
          val off = (lane % 4) * 4
          val cur = mins(lane)
          var replace = cur == null
          if (!replace) {
            var i = 0
            var cmp = 0
            while (cmp == 0 && i < 4) {
              cmp = (digest(off + i) & 0xFF) - (cur(i) & 0xFF)
              i += 1
            }
            replace = cmp < 0
          }
          if (replace) {
            val copy = new Array[Byte](4)
            System.arraycopy(digest, off, copy, 0, 4)
            mins(lane) = copy
          }
          lane += 1
        }
        d += 1
      }
      g += 1
    }
    val out = new Array[Any](numHashes)
    var l = 0
    while (l < numHashes) {
      val raw = mins(l)
      val hex = new Array[Byte](8)
      var i = 0
      while (i < 4) {
        hex(2 * i) = hexDigits((raw(i) >> 4) & 0xF)
        hex(2 * i + 1) = hexDigits(raw(i) & 0xF)
        i += 1
      }
      out(l) = UTF8String.fromBytes(hex)
      l += 1
    }
    new GenericArrayData(out)
  }

  /** Count of maximal runs of non-whitespace bytes — exactly
    * `size(split(trim(regexp_replace(s, '\s+', ' ')), ' '))` with 0 for
    * empty/all-whitespace input: Java regex `\s` and RE2's are the same
    * six ASCII chars, and multi-byte UTF-8 units (high bit set) can
    * never be whitespace, so the byte scan IS the regex pipeline minus
    * its two string materializations and the split array. */
  def wsWordCount(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var cnt = 0
    while (i < n) {
      if (isAsciiWs(b(i))) i += 1
      else {
        cnt += 1
        i += 1
        while (i < n && !isAsciiWs(b(i))) i += 1
      }
    }
    cnt
  }

  /** The stopword tables of [[graft.functions.TextFns.langStopwords]] as
    * byte patterns, in registry order (de, en, es, fr + zh chars). The
    * kernel implements the ASCII word boundary — a stopword counts when
    * its maximal [A-Za-z0-9_] byte run equals it exactly — which is
    * RE2's `\b`, i.e. EXACTLY what the DuckDB oracle evaluates; since
    * multi-byte UTF-8 units have the high bit set they can never extend
    * a word run, so the byte scan and RE2 agree on every input. NOTE
    * this is deliberately NOT java.util.regex semantics: Java's `\b` is
    * Unicode-aware even without UNICODE_CHARACTER_CLASS (empirically,
    * `\bthe\b` does NOT match in "the的" or "theÿ" under Java, but does
    * under RE2), so the regexp_count form this kernel replaced carried a
    * latent engine divergence on stopwords abutting non-ASCII letters —
    * the kernel upgrades oracle parity from data-dependent to total.
    * The zh chars carry no `\b` and are single-codepoint alternatives:
    * counting 3-byte window matches is the regex count in BOTH engines,
    * and UTF-8 self-synchronization (continuation bytes 0x80–0xBF are
    * never the lead bytes 0xE4–0xE7) means no match can start
    * mid-character. */
  // Derived FROM langStopwords (not hand-copied): the oracle SQL, the
  // lang_argmax wiring, and this kernel must move together when a
  // stopword table changes, so the byte tables parse the single source
  // of truth. Shape asserted here: first 4 patterns are \b(w|…)\b over
  // lowercase ASCII words, the 5th is a bare (c|…) of 3-byte chars.
  private def alternatives(pat: String, prefix: String, suffix: String): Array[String] = {
    require(pat.startsWith(prefix) && pat.endsWith(suffix),
      s"stopword pattern shape changed: $pat")
    pat.stripPrefix(prefix).stripSuffix(suffix).split('|')
  }
  private val langWords: Array[Array[Array[Byte]]] =
    graft.functions.TextFns.langStopwords.take(4).map { case (_, pat) =>
      alternatives(pat, "\\b(", ")\\b").map { w =>
        require(w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'),
          s"non-ASCII-lowercase stopword '$w' breaks the byte-run match")
        w.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      }
    }.toArray
  private val zhChars: Array[Array[Byte]] =
    alternatives(graft.functions.TextFns.langStopwords(4)._2, "(", ")").map { c =>
      val b = c.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(b.length == 3, s"zh stopword '$c' is not a 3-byte UTF-8 char")
      b
    }

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** One-pass stopword-hit counts for all five languages — replaces five
    * full-text regex scans (one per language) with a single byte scan.
    * Returns counts in langStopwords order: [de, en, es, fr, zh]. */
  def langHits(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val counts = new Array[Int](5)
    var i = 0
    while (i < n) {
      val c = b(i)
      if (isWordByte(c)) {
        val start = i
        i += 1
        while (i < n && isWordByte(b(i))) i += 1
        val len = i - start
        var l = 0
        while (l < 4) {
          val ws = langWords(l)
          var k = 0
          var hit = false
          while (k < ws.length && !hit) {
            val w = ws(k)
            if (w.length == len) {
              var j = 0
              while (j < len && w(j) == b(start + j)) j += 1
              if (j == len) { counts(l) += 1; hit = true }
            }
            k += 1
          }
          l += 1
        }
      } else if ((c & 0x80) != 0 && i + 3 <= n) {
        var k = 0
        var hit = false
        while (k < zhChars.length && !hit) {
          val p = zhChars(k)
          if (b(i) == p(0) && b(i + 1) == p(1) && b(i + 2) == p(2)) {
            counts(4) += 1
            i += 3
            hit = true
          }
          k += 1
        }
        if (!hit) i += 1
      } else i += 1
    }
    new GenericArrayData(counts.map(x => x: Any))
  }

  /** Row-local term frequencies: token -> occurrence count, keys in
    * first-occurrence order. Term frequency is a per-DOCUMENT fact, so
    * the explode-then-groupBy(doc, term) form this replaces shuffled one
    * row per token OCCURRENCE to aggregate what the row already owned;
    * `explode(tf_map(toks))` emits one pre-counted row per DISTINCT term
    * instead, with no exchange. Counts are identical to the groupBy's
    * COUNT(*) by construction (same token stream, same equality). */
  def tfMap(toks: ArrayData): MapData = {
    val n = toks.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Integer](
      math.min(n, 64) * 2 + 4)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = m.get(t)
      m.put(t, if (c == null) 1 else c + 1)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue.intValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Row-local SimHash over ascii_alpha_tokens(s): bit i of the result
    * (bit position bits-1-i) is set iff the sum over tokens of
    * (+1 if hex digit i of md5(token) has an odd CHAR CODE else -1) is
    * >= 0 — the exact bit definition of the exploded DedupOps.simHashes
    * aggregation and its DuckDB oracle (`(ascii(substr(h, i+1, 1)) % 2)
    * * 2 - 1`). Zero tokens -> all votes 0 -> all bits set. Replaces an
    * explode + md5 column + bits-wide sum aggregation: the votes were a
    * SHUFFLE of one row per token; this is one codegen'd call per row.
    * Hex-digit parity from the digest bytes directly: digit 2j is the
    * high nibble of byte j — '0'..'9' codes 48+d (even base), 'a'..'f'
    * codes 87+d (odd base), so char-code parity = d&1 for d<10, else
    * ~d&1. */
  def simHash(s: UTF8String, bits: Int): Long = {
    val toks = asciiRuns(s, withDigits = false, minLen = 1)
    val n = toks.numElements()
    val votes = new Array[Int](bits)
    val md = md5Local.get()
    var t = 0
    while (t < n) {
      md.reset()
      val digest = md.digest(toks.getUTF8String(t).getBytes)
      var i = 0
      while (i < bits) {
        val b = digest(i >> 1)
        val d = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
        val codeEven = if (d < 10) (d & 1) == 0 else (d & 1) == 1
        votes(i) += (if (codeEven) -1 else 1)
        i += 1
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) >= 0) sim |= 1L << (bits - 1 - i)
      i += 1
    }
    sim
  }

  /** One-pass repetition signals for CorpusOps.repetitionSignals —
    * replaces two explode+groupBy+groupBy branches (four shuffles) with a
    * row-local kernel; the Gopher-style signals are per-DOCUMENT facts,
    * and a document's text lives in one row. Returns
    * (n_lines, n_dup_lines, top_bigram_cnt, n_bigrams), all longs
    * (schema-identical to the aggregation form):
    *
    *   - lines: split on '\n'; blank = all-space (both engines' trim
    *     strips ' ' only); duplicates are EXACT untrimmed repeats.
    *   - bigrams: over asciiRuns(text, digits, 1), adjacent pairs; a doc
    *     with <2 tokens has ONE degenerate gram (the lone token, or ""),
    *     reproducing the kgrams greatest(n-1, 1) convention the
    *     oracle SQL replays.
    */
  def repStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    // line pass
    var nLines = 0L
    val seen = new java.util.HashSet[UTF8String]()
    var dup = 0L
    var lineStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == '\n') {
        var blank = true
        var j = lineStart
        while (blank && j < i) { if (b(j) != ' ') blank = false; j += 1 }
        if (!blank) {
          nLines += 1
          if (!seen.add(UTF8String.fromBytes(b, lineStart, i - lineStart))) dup += 1
        }
        lineStart = i + 1
      }
      i += 1
    }
    // bigram pass
    val toks = asciiRuns(s, withDigits = true, minLen = 1)
    val nt = toks.numElements()
    var top = 1L
    val nBigrams = math.max(nt - 1L, 1L)
    if (nt >= 2) {
      val counts = new java.util.HashMap[UTF8String, Long]()
      var k = 0
      while (k < nt - 1) {
        val key = UTF8String.concat(
          toks.getUTF8String(k), UTF8String.fromString(" "), toks.getUTF8String(k + 1))
        val c = counts.merge(key, 1L, (a, bb) => a + bb)
        if (c > top) top = c
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nLines, dup, top, nBigrams))
  }
}

/** `ascii_tokens(s)` / `ascii_alpha_tokens(s[, minLen])`: codegen'd
  * maximal-ASCII-run tokenizer (see [[TokenKernels.asciiRuns]]). */
case class AsciiTokensExpr(child: Expression, withDigits: Boolean, minLen: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (withDigits) "ascii_tokens" else "ascii_alpha_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.asciiRuns(input.asInstanceOf[UTF8String], withDigits, minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenKernels.asciiRuns($c, $withDigits, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokensExpr =
    copy(child = newChild)
}

/** `bpe_tokens(s)`: the BPE-ish mixed tokenizer as a codegen'd kernel
  * (see [[TokenKernels.bpeTokens]]). */
case class BpeTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.bpeTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.bpeTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)
}

/** `bpe_count(s)`: token COUNT without the token array (the packing /
  * length-stats paths only consume the count). */
case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.bpeCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.bpeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** `kgrams(toks, k)` / `distinct_kgrams(toks, k)`: codegen'd shingle
  * construction (see [[TokenKernels.kgrams]]). */
case class KGramsExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (distinct) "distinct_kgrams" else "kgrams"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.kgrams(input.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenKernels.kgrams($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): KGramsExpr =
    copy(child = newChild)
}

/** `minhash_lanes(toks, k, numHashes)`: row-local MinHash lane minima
  * (see [[TokenKernels.minhashLanes]]). */
case class MinHashLanesExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 36,
    "minhash_lanes supports 1..36 lanes (single-char digest salt)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_lanes expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_lanes"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.minhashLanes(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenKernels.minhashLanes($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashLanesExpr =
    copy(child = newChild)
}

/** `ws_word_count(s)`: whitespace-separated word count (see
  * [[TokenKernels.wsWordCount]]). */
case class WsWordCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ws_word_count expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_word_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.wsWordCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.wsWordCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsWordCountExpr =
    copy(child = newChild)
}

/** `lang_hits(s)`: one-pass stopword-hit counts for all five languages
  * as ARRAY<INT> in langStopwords order (see [[TokenKernels.langHits]]). */
case class LangHitsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_hits expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_hits"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.langHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.langHits($c)")

  override protected def withNewChildInternal(newChild: Expression): LangHitsExpr =
    copy(child = newChild)
}

/** `tf_map(toks)`: row-local term frequencies as MAP<STRING, INT> (see
  * [[TokenKernels.tfMap]]). */
case class TfMapExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tf_map expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "tf_map"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.tfMap(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.tfMap($c)")

  override protected def withNewChildInternal(newChild: Expression): TfMapExpr =
    copy(child = newChild)
}

/** `ascii_simhash(s, bits)`: row-local SimHash (see
  * [[TokenKernels.simHash]]). */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_simhash expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "ascii_simhash"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.simHash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.simHash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** `rep_stats(s)`: one-pass intra-document repetition signals (see
  * [[TokenKernels.repStats]]). */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenKernels.repStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.repStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}
