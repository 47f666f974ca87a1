package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from generated code (Scala object static
  * forwarders make them callable from Janino-compiled Java).
  */
object TextExprUtil {

  /** Count of maximal `[A-Za-z]+|[0-9]+` runs — a BPE-ish pre-token count
    * without regex machinery in the hot loop.
    */
  def tokenCount(s: UTF8String): Int = {
    val str = s.toString
    var i = 0; var n = 0
    val len = str.length
    while (i < len) {
      val c = str.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        n += 1
        while (i < len && { val d = str.charAt(i)
          (d >= 'A' && d <= 'Z') || (d >= 'a' && d <= 'z') }) i += 1
      } else if (c >= '0' && c <= '9') {
        n += 1
        while (i < len && { val d = str.charAt(i); d >= '0' && d <= '9' }) i += 1
      } else i += 1
    }
    n
  }

  /** Position-weighted polynomial fingerprint:
    * sum_i code(c_i) * ((i+1) * 2654435761 mod 1000000007), 1-based i
    * over Unicode CODE POINTS (not UTF-16 code units) — SQL engines index
    * strings by character, so charAt iteration would diverge on any
    * non-BMP text (emoji, rare CJK). Order-sensitive but
    * associative-friendly weights keep it exactly reproducible in plain
    * SQL (see t4 oracle).
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0  // UTF-16 index
    var cp = 0 // code-point index (what the oracle's substr/unicode sees)
    val len = str.length
    while (i < len) {
      val c = str.codePointAt(i)
      val w = (cp + 1).toLong * 2654435761L % 1000000007L
      h += c.toLong * w
      i += Character.charCount(c)
      cp += 1
    }
    h
  }

  /** Unicode NFC canonical normalization (java.text.Normalizer — JDK
    * implements the Unicode standard algorithm, so results are
    * byte-identical to DuckDB's utf8proc nfc_normalize on canonical
    * composition AND pure reordering cases, probed empirically incl.
    * U+0307+U+0323 → U+0323+U+0307). Fast path: Normalizer.isNormalized
    * is a cheap scan, and crawled corpora are overwhelmingly already
    * NFC — the common row never allocates a second string. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native token-count expression; stays inside whole-stage codegen. */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextExprUtil.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextExprUtil.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): TokenCount = copy(c)
}

/** Native NFC normalization expression — the tokenizer-input contract
  * pass (two byte-distinct spellings of é must be ONE vocab entry);
  * stays inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextExprUtil.nfcNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextExprUtil.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

/** Native rolling-hash fingerprint expression. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextExprUtil.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextExprUtil.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
}
