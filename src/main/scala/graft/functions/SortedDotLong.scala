package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse integer dot product over two TERM-SORTED (term, weight) entry
  * arrays — the codegen'd replacement for the p60 tf-idf numerator's
  * interpreted `aggregate(map_entries(ma), ...)` fold.
  *
  * Why not a map-typed expression: Spark's `element_at`/`try_element_at`
  * on a map is a LINEAR key scan, so folding one doc's map while probing
  * the other's is O(|a|·|b|) per candidate pair — on top of per-element
  * interpreted-lambda overhead. With both vectors stored as entry arrays
  * sorted by term (`sort_array(collect_list(struct(term, w)))`, one sort
  * per DOC, not per pair), a single merge walk computes the dot product
  * in O(|a|+|b|) comparisons with zero allocation per pair.
  *
  * Arithmetic mirrors the decimal formulation it replaces (and DuckDB's
  * HUGEINT promotion): the fast path accumulates in a long with
  * `multiplyExact`/`addExact`, and any overflow restarts the row on an
  * exact BigInteger path — weights near 3e9 (tf ≈ 3e6 on an idf-capped
  * term) square to ~9e18, right at Long.MaxValue, so wraparound must
  * fall back rather than corrupt. Result type DECIMAL(38,0), bit-equal
  * to the prior `aggregate` form (integer sums are order-independent).
  */
case class SortedDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "sorted_dot_long"

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(StructType(Array(k, v)), _) =>
      k.dataType == StringType && v.dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_dot_long requires array<struct<string,bigint>> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedDotLong.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedDotLong.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedDotLong =
    copy(left = newLeft, right = newRight)
}

object SortedDotLong {

  /** SQL-registration builder. */
  def forArgs(exprs: Seq[Expression]): SortedDotLong = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"sorted_dot_long takes (a, b); got ${exprs.size} arguments")
    SortedDotLong(exprs(0), exprs(1))
  }

  /** Referenced from generated code — keep public and stable.
    * Merge-walk over two term-sorted entry arrays; long fast path,
    * BigInteger retry on overflow.
    */
  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val na = a.numElements()
    val nb = b.numElements()
    try {
      var acc = 0L
      var i = 0
      var j = 0
      while (i < na && j < nb) {
        val ra = a.getStruct(i, 2)
        val rb = b.getStruct(j, 2)
        val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
        if (c == 0) {
          acc = Math.addExact(acc, Math.multiplyExact(ra.getLong(1), rb.getLong(1)))
          i += 1; j += 1
        } else if (c < 0) i += 1
        else j += 1
      }
      Decimal(acc)
    } catch {
      case _: ArithmeticException => slowDot(a, b, na, nb)
    }
  }

  private def slowDot(a: ArrayData, b: ArrayData, na: Int, nb: Int): Decimal = {
    var acc = BigInteger.ZERO
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) {
        acc = acc.add(
          BigInteger.valueOf(ra.getLong(1)).multiply(BigInteger.valueOf(rb.getLong(1))))
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    Decimal(BigDecimal(acc), 38, 0)
  }
}
