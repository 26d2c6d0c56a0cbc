package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE piece framing as ONE native pass: `bpe_frame(text)` wraps every
  * non-space code point as U+001F c U+001E (frame start / piece / frame
  * end) and passes spaces through as bare separators — the framed form
  * [[graft.ops.TextOps.encodeWithMerges]]'s chained literal replaces
  * operate on (a merge pattern needs its two framed pieces ADJACENT, so
  * no pattern can span the space between words).
  *
  * Replaces the composed per-word `transform(sequence(..), i ->
  * concat(F, substr(w, i, 1), E))` framing, which allocated two arrays
  * per word and a UTF8String per character — the measured hot path of
  * tokenizer-apply at 10x corpus scale. Against the per-word framed-join
  * form the only byte difference is around REPEATED spaces (this form
  * keeps each one; the word-join form collapses them), which no consumer
  * observes: merge patterns cannot cross any space either way and the
  * token count reads only the U+001E terminators.
  */
case class BpeFrame(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_frame requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_frame"

  override def nullSafeEval(input: Any): Any =
    BpeFrame.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeFrame.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeFrame =
    copy(child = newChild)
}

object BpeFrame {
  /** Referenced from generated code — keep public and stable. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val out = new java.lang.StringBuilder(s.length * 3)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') out.append(' ')
      else {
        out.append('\u001F')
        out.appendCodePoint(cp)
        out.append('\u001E')
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
