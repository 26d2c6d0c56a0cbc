package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit length of the input's two's-complement bit pattern — for
  * non-negative x this is floor(log2(x)) + 1 (and 0 for x = 0), as one
  * branch-free `Long.numberOfLeadingZeros` instruction. The domain is
  * TYPED, not assumed: an IntegerType input is masked to its unsigned
  * 32-bit pattern (so bit_length_long(-1 :: int) = 32, the width of the
  * pattern, never a sign-extension artifact) and a negative LongType
  * input returns 64 (its 64-bit pattern's width). The r14 form
  * documented "non-negative only" in a comment while the registered SQL
  * function silently sign-extended ints — the typed-pattern semantics
  * close that gap without a branch (ADVICE r14).
  *
  * This is the HLL rho hot path ([[graft.ops.Sketches.hllCard]]): rho =
  * (restBits + 1) - bit_length(rest) needs the position of the remainder's
  * highest set bit per distinct (source, hash) row, and the composed
  * `length(bin(x))` form allocates a 64-char binary STRING per row just
  * to count its characters. Same integer result, zero allocation, stays
  * inside whole-stage codegen.
  */
case class BitLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_length_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bit_length_long requires a bigint/int argument, got ${other.catalogString}")
  }

  private def isInt = child.dataType == IntegerType

  override def nullSafeEval(x: Any): Any = {
    val v =
      if (isInt) x.asInstanceOf[Int].toLong & 0xffffffffL
      else x.asInstanceOf[Long]
    64 - java.lang.Long.numberOfLeadingZeros(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val v = if (isInt) s"(((long) $x) & 0xffffffffL)" else x
      s"${ev.value} = 64 - java.lang.Long.numberOfLeadingZeros($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BitLength =
    copy(child = newChild)
}
