package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise LEFT-fold sum of a list of equal-length double vectors:
  * `vec_fold_sum(arr_of_vecs)` returns out[p] = ((v1[p] + v2[p]) + v3[p])
  * + … in the list's order — the vector form of the exact-order scalar
  * fold `aggregate(transform(arr, t -> t.x), 0D, (a, b) -> a + b)` the
  * hierarchical reductions use, evaluated as one tight codegen'd loop
  * instead of one interpreted lambda frame per element per position.
  * Feeding it a vec_id-sorted collect keeps every per-position sum
  * bit-identical to the per-position scalar fold: the accumulator seeds
  * at +0.0 and adds every vector including the first, the exact operand
  * chain of `aggregate(…, 0D, (a, b) -> a + b)` (seeding with the first
  * vector instead would flip the sign of an all-negative-zero prefix).
  *
  * An empty list returns an empty array; vectors shorter than the first
  * are an error (the inputs are fixed-dimension embeddings).
  */
case class VecFoldSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_fold_sum requires array<array<double>>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_fold_sum"

  override def nullSafeEval(input: Any): Any =
    VecFoldSum.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecFoldSum.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): VecFoldSum =
    copy(child = newChild)
}

object VecFoldSum {

  /** Referenced from generated code — keep public and stable. */
  def compute(vecs: ArrayData): ArrayData = {
    val n = vecs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Double])
    val d = vecs.getArray(0).numElements()
    val acc = new Array[Double](d) // +0.0 seeds, as the scalar fold's 0D
    var i = 0
    while (i < n) {
      val v = vecs.getArray(i)
      require(v.numElements() == d,
        s"vec_fold_sum: vector ${i} has ${v.numElements()} dims, expected $d")
      var p = 0
      while (p < d) { acc(p) += v.getDouble(p); p += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }
}
