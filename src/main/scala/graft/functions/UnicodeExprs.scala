package graft.functions

import java.text.{BreakIterator, Normalizer}
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text kernels a multilingual corpus pipeline needs that Spark
  * lacks as builtins, each codegen'd (NativeExprs discipline) and each
  * with an exact DuckDB twin for the oracle gate:
  *
  *   - `nfc_normalize` — canonical composition (java.text.Normalizer
  *     NFC ≙ DuckDB nfc_normalize, both Unicode canonical composition):
  *     THE first normalization pass over crawled text, where the same
  *     visible string arrives both composed and decomposed and every
  *     downstream exact/dedup hash would treat them as different docs.
  *   - `grapheme_len` — length in extended grapheme clusters (UAX #29,
  *     java.text.BreakIterator ≙ DuckDB length_grapheme): the
  *     "user-visible characters" metric for length gates on scripts
  *     where codepoint counts overstate (combining marks, Hangul jamo).
  */
object UnicodeExprs {

  /** Static entry points for generated code (stable JVM names). */
  def nfcJvm(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is a cheap scan and crawled
    // text is overwhelmingly already NFC — skip the allocation then.
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  // (No codepoint-length kernel: Spark's builtin `length` already counts
  // codepoints — UTF8String.numChars walks UTF-8 lead bytes — matching
  // DuckDB's `length` exactly, astral chars included; pinned in
  // UnicodeExprsSpec.)

  // BreakIterator is stateful and not thread-safe; one per executor
  // thread, reused across rows (instantiation is the expensive part).
  private val graphemeIt: ThreadLocal[BreakIterator] =
    ThreadLocal.withInitial(() => BreakIterator.getCharacterInstance(Locale.ROOT))

  def graphemeLenJvm(s: UTF8String): Int = {
    val it = graphemeIt.get()
    it.setText(s.toString)
    var n = 0
    while (it.next() != BreakIterator.DONE) n += 1
    n
  }
}

private[functions] abstract class UnicodeUnaryExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
}

/** Unicode NFC (canonical composition) of a string; null-propagating. */
case class NfcNormalizeExpr(child: Expression) extends UnicodeUnaryExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeExprs.nfcJvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExprs.nfcJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Length in extended grapheme clusters (DuckDB `length_grapheme`). */
case class GraphemeLenExpr(child: Expression) extends UnicodeUnaryExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "grapheme_len"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeExprs.graphemeLenJvm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExprs.graphemeLenJvm($c)")

  override protected def withNewChildInternal(newChild: Expression): GraphemeLenExpr =
    copy(child = newChild)
}
