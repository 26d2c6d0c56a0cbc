package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as ONE native Catalyst expression:
  * `ngram_shingles(text)` over space-split tokens, equivalent to the
  * composed form
  * `transform(sequence(0, size(split(text,' ')) - n), i -> concat_ws(' ',
  * slice(split(text,' '), i+1, n)))` (empty array when the doc has fewer
  * than n tokens, so `explode` drops it exactly like the filtered form).
  *
  * The composed form pays four interpreted higher-order/collection
  * expressions and materializes the token array plus a lambda frame per
  * shingle; this one stays inside whole-stage codegen and builds each
  * shingle with a single byte-copy — measurable on every shingle-based
  * dedup operator (exact Jaccard, MinHash), and the difference between
  * scan-speed and lambda-interpreter-speed at corpus scale.
  */
case class NgramShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngram_shingles requires a string argument, got ${child.dataType.catalogString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"ngram_shingles requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any =
    NgramShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

object NgramShingles {

  /** SQL-registration builder: the optional second argument must be a
    * foldable integer literal — checked here so a bad call surfaces as a
    * clear error instead of an internal eval() crash on an unbound or
    * non-numeric expression.
    */
  def forArgs(exprs: Seq[Expression]): NgramShingles = {
    if (exprs.isEmpty || exprs.size > 2)
      throw new IllegalArgumentException(
        s"ngram_shingles takes (text[, n]); got ${exprs.size} arguments")
    val n = exprs.lift(1) match {
      case None => 3
      case Some(e) if e.foldable =>
        e.eval() match {
          case num: Number => num.intValue
          case other => throw new IllegalArgumentException(
            s"ngram_shingles: n must be an integer literal, got $other")
        }
      case Some(_) => throw new IllegalArgumentException(
        "ngram_shingles: n must be an integer literal, not a column")
    }
    NgramShingles(exprs.head, n)
  }

  private val Space = UTF8String.fromString(" ")

  /** Referenced from generated code — keep public and stable. Tokens are
    * the single-space split (consecutive spaces yield empty tokens, same
    * as split/string_split in Spark and DuckDB).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(Space, -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      // concat tokens i..i+n-1 with single spaces, one allocation each
      var j = 0
      var sh: UTF8String = null
      while (j < n) {
        val t = toks(i + j)
        sh = if (sh == null) t else UTF8String.concat(sh, Space, t)
        j += 1
      }
      out(i) = sh
      i += 1
    }
    new GenericArrayData(out)
  }
}
