package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bit length of a non-negative long — floor(log2(x)) + 1, and 0 for
  * x = 0 — as one branch-free `Long.numberOfLeadingZeros` instruction.
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
    val v = if (isInt) x.asInstanceOf[Int].toLong else x.asInstanceOf[Long]
    64 - java.lang.Long.numberOfLeadingZeros(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val v = if (isInt) s"(long) $x" else x
      s"${ev.value} = 64 - java.lang.Long.numberOfLeadingZeros($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BitLength =
    copy(child = newChild)
}
