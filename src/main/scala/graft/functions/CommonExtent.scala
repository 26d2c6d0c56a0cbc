package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Maximal common-substring extent around a verified anchor:
  * `common_extent(ta, pa, tb, pb, k, cap)` returns the length of the
  * longest exact run shared by `ta` and `tb` through the k-code-point
  * anchor starting at 1-based code-point positions `pa`/`pb` — i.e.
  * k + leftExt + rightExt, where each extension compares code points
  * outward from the anchor until the first mismatch, a text boundary,
  * or `cap` code points (the cap bounds per-row work, so a pathological
  * pair of identical megadocuments cannot stall a task).
  *
  * The k anchor code points themselves are NOT re-compared — the caller
  * joined on the literal anchor gram, so equality there is already
  * verified; re-checking would double-charge every row for the common
  * case. One O(cap) loop per row, codegen'd, no allocation beyond the
  * two code-point arrays (bounded by the document length).
  */
case class CommonExtent(first: Expression, second: Expression,
    third: Expression, fourth: Expression, k: Int, cap: Int,
    packed: Boolean = false)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType || third.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("common_extent requires (string, long, string, long)")
    else if (second.dataType != LongType || fourth.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("common_extent requires (string, long, string, long)")
    else if (k < 1 || cap < 0)
      TypeCheckResult.TypeCheckFailure(s"common_extent requires k >= 1 and cap >= 0, got ($k, $cap)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String =
    if (packed) "common_extent_packed" else "common_extent"

  private def method: String = if (packed) "computePacked" else "compute"

  override protected def nullSafeEval(ta: Any, pa: Any, tb: Any, pb: Any): Any =
    if (packed)
      CommonExtent.computePacked(ta.asInstanceOf[UTF8String], pa.asInstanceOf[Long],
        tb.asInstanceOf[UTF8String], pb.asInstanceOf[Long], k, cap)
    else
      CommonExtent.compute(ta.asInstanceOf[UTF8String], pa.asInstanceOf[Long],
        tb.asInstanceOf[UTF8String], pb.asInstanceOf[Long], k, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ta, pa, tb, pb) =>
      s"graft.functions.CommonExtent.$method($ta, $pa, $tb, $pb, $k, $cap)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): CommonExtent =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object CommonExtent {

  /** SQL-registration builder; k and cap must be foldable integer literals. */
  def forArgs(exprs: Seq[Expression]): CommonExtent = forArgs(exprs, packed = false)

  /** The packed variant: returns `span * 2^32 + leftExt`, so a caller that
    * needs the span's POSITION (an excision rewrite, not just a length
    * report) recovers `start = pb - leftExt` from the same single O(cap)
    * scan — no second expression call, no second text fetch.
    */
  def forArgsPacked(exprs: Seq[Expression]): CommonExtent = forArgs(exprs, packed = true)

  private def forArgs(exprs: Seq[Expression], packed: Boolean): CommonExtent = {
    if (exprs.size != 6)
      throw new IllegalArgumentException(
        s"common_extent takes (ta, pa, tb, pb, k, cap); got ${exprs.size} arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"common_extent: $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"common_extent: $name must be an integer literal, not a column")
    }
    CommonExtent(exprs(0), exprs(1), exprs(2), exprs(3),
      intLit(exprs(4), "k"), intLit(exprs(5), "cap"), packed)
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(ta: UTF8String, pa: Long, tb: UTF8String, pb: Long,
      k: Int, cap: Int): Long = {
    val a = ta.toString.codePoints().toArray
    val b = tb.toString.codePoints().toArray
    val ia = pa.toInt - 1 // 0-based anchor start in a
    val ib = pb.toInt - 1
    // Left: compare code points before the anchor, newest-first.
    var left = 0
    val maxLeft = math.min(cap, math.min(ia, ib))
    while (left < maxLeft && a(ia - left - 1) == b(ib - left - 1)) left += 1
    // Right: compare code points after the anchor's k-span.
    var right = 0
    val maxRight = math.min(cap,
      math.min(a.length - (ia + k), b.length - (ib + k)))
    while (right < maxRight && a(ia + k + right) == b(ib + k + right)) right += 1
    k.toLong + left + right
  }

  /** Referenced from generated code — keep public and stable. Packed form:
    * `span * 2^32 + leftExt` (span <= k + 2*cap < 2^32 always).
    */
  def computePacked(ta: UTF8String, pa: Long, tb: UTF8String, pb: Long,
      k: Int, cap: Int): Long = {
    val a = ta.toString.codePoints().toArray
    val b = tb.toString.codePoints().toArray
    val ia = pa.toInt - 1
    val ib = pb.toInt - 1
    var left = 0
    val maxLeft = math.min(cap, math.min(ia, ib))
    while (left < maxLeft && a(ia - left - 1) == b(ib - left - 1)) left += 1
    var right = 0
    val maxRight = math.min(cap,
      math.min(a.length - (ia + k), b.length - (ib + k)))
    while (right < maxRight && a(ia + k + right) == b(ib + k + right)) right += 1
    (k.toLong + left + right) * 4294967296L + left
  }
}
