package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** PQ code assignment as ONE native Catalyst expression:
  * `pq_code(sub, sv, cbFlat, ks, subDim)` returns the id of the nearest
  * codebook centroid for subvector `sv` in subspace `sub` — squared-L2
  * distance as the same SEQUENTIAL per-dimension fold as
  * [[SqDist]] (bit-identical doubles), ties to the smaller centroid id
  * (strict `<` while scanning ids ascending).
  *
  * The codebook rides in as a FOLDED literal (`typedlit` of the
  * [sub][j][dim]-flattened doubles — m·ks·subDim values, kilobytes): the
  * trained centroids are model state exactly like the k-means driver
  * loop's, so collecting them once per iteration and folding them into
  * the next plan replaces the ks-way fanout join + min_by aggregate
  * (corpus × ks rows through an ObjectHashAggregate) with one row-local
  * argmin loop inside whole-stage codegen. O(ks · subDim) per
  * subvector.
  */
case class PqCode(left: Expression, right: Expression,
    cbFlat: Array[Double], ks: Int, subDim: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != IntegerType && left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"pq_code requires an integral subspace index, got ${left.dataType.catalogString}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"pq_code requires array<double> subvectors, got ${right.dataType.catalogString}")
    else if (ks < 1 || subDim < 1 || cbFlat.length == 0 ||
      cbFlat.length % (ks * subDim) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"pq_code codebook length ${cbFlat.length} must be a nonzero multiple of ks*subDim")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_code"

  override def nullSafeEval(sub: Any, sv: Any): Any =
    PqCode.compute(sub.asInstanceOf[Number].intValue(),
      sv.asInstanceOf[ArrayData], cbFlat, ks, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbFlat", cbFlat, "double[]")
    defineCodeGen(ctx, ev, (s, v) =>
      s"graft.functions.PqCode.compute((int) $s, $v, $ref, $ks, $subDim)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCode =
    copy(left = newLeft, right = newRight)
}

object PqCode {

  /** SQL-registration builder: `pq_code(sub, sv, cbFlatLiteral, ks,
    * subDim)` — the codebook array and the two sizes must be foldable
    * (the codebook is `typedlit` of the collected model state).
    */
  def forArgs(exprs: Seq[Expression]): PqCode = {
    if (exprs.size != 5)
      throw new IllegalArgumentException(
        s"pq_code takes (sub, sv, cbFlat, ks, subDim); got ${exprs.size} arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"pq_code: $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"pq_code: $name must be an integer literal, not a column")
    }
    val cb = exprs(2) match {
      case l if l.foldable => l.eval() match {
        case a: ArrayData => a.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"pq_code: codebook must be a foldable double array, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "pq_code: codebook must be a foldable double array, not a column")
    }
    PqCode(exprs(0), exprs(1), cb, intLit(exprs(3), "ks"), intLit(exprs(4), "subDim"))
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(sub: Int, sv: ArrayData, cbFlat: Array[Double],
      ks: Int, subDim: Int): Int = {
    // Validate before indexing: a short subvector or an out-of-range
    // subspace index gets a named error, not an AIOOBE from codegen.
    val m = cbFlat.length / (ks * subDim)
    if (sub < 0 || sub >= m)
      throw new IllegalArgumentException(
        s"pq_code: subspace index $sub out of range [0, $m)")
    if (sv.numElements() < subDim)
      throw new IllegalArgumentException(
        s"pq_code: subvector has ${sv.numElements()} dims, codebook expects $subDim")
    val base = sub * ks * subDim
    var bestJ = 0
    var bestD = java.lang.Double.POSITIVE_INFINITY
    var j = 0
    while (j < ks) {
      val off = base + j * subDim
      // Sequential fold in dimension order — the SqDist operand chain.
      var d = 0.0
      var p = 0
      while (p < subDim) {
        val diff = sv.getDouble(p) - cbFlat(off + p)
        d += diff * diff
        p += 1
      }
      if (d < bestD) { bestD = d; bestJ = j } // strict: ties keep smaller j
      j += 1
    }
    bestJ
  }
}
