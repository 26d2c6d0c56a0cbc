package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken) as ONE native
  * Catalyst expression: `winnow_hashes(text, k, w)` returns the distinct
  * minima of each w-window of consecutive char-k-gram hashes.
  *
  * The k-gram hash is the [[RollingHash]] polynomial over code points —
  * `h = (h*31 + cp) mod 1e9+7` — slid across the document in O(1) per
  * position (subtract the outgoing code point's 31^(k-1) term), and the
  * window minima come from a monotonic deque, so the whole selection is
  * O(len) per document. The composed SQL form this replaces (an md5 +
  * conv per character position inside two nested transforms) was the
  * single heaviest constant in the winnowing query — linear too, but with
  * a digest per position and interpreted lambda frames.
  *
  * Degenerate inputs mirror the composed form: a document shorter than k
  * contributes its whole text as the single gram (the empty string hashes
  * to 0), and fewer than w grams yield one window over what exists.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_hashes requires a string argument, got ${child.dataType.catalogString}")
    else if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(s"winnow_hashes requires k >= 1 and w >= 1, got ($k, $w)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowHashes.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {

  /** SQL-registration builder; k and w must be foldable integer literals. */
  def forArgs(exprs: Seq[Expression]): WinnowHashes = {
    if (exprs.size != 3)
      throw new IllegalArgumentException(
        s"winnow_hashes takes (text, k, w); got ${exprs.size} arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"winnow_hashes: $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"winnow_hashes: $name must be an integer literal, not a column")
    }
    WinnowHashes(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "w"))
  }

  import RollingHash.Mod

  /** Referenced from generated code — keep public and stable. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val str = text.toString
    // Code points, to match RollingHash.hash (and DuckDB's unicode()).
    val cps = str.codePoints().toArray
    val m = cps.length
    val numGrams = math.max(m - k + 1, 1)
    val hs = new Array[Long](numGrams)
    if (m < k) {
      // One short gram: the whole text ("" hashes to 0).
      var h = 0L
      var t = 0
      while (t < m) { h = (h * 31 + cps(t)) % Mod; t += 1 }
      hs(0) = h
    } else {
      var h = 0L
      var t = 0
      while (t < k) { h = (h * 31 + cps(t)) % Mod; t += 1 }
      hs(0) = h
      // 31^(k-1) mod p: the outgoing code point's positional weight.
      var pk = 1L
      var e = 0
      while (e < k - 1) { pk = pk * 31 % Mod; e += 1 }
      var i = 1
      while (i < numGrams) {
        // max intermediate: (Mod-1)*31 + cp < 2^35 — no overflow.
        h = ((h - cps(i - 1) * pk % Mod + Mod) % Mod * 31 + cps(i + k - 1)) % Mod
        hs(i) = h
        i += 1
      }
    }
    // Distinct window minima, first-occurrence order (same value set as
    // the composed array_distinct-of-minima form).
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (numGrams <= w) {
      var mn = Long.MaxValue
      var i = 0
      while (i < numGrams) { if (hs(i) < mn) mn = hs(i); i += 1 }
      seen.add(mn)
    } else {
      // Monotonic deque of candidate indices: O(numGrams) total.
      val dq = new java.util.ArrayDeque[Integer]()
      var i = 0
      while (i < numGrams) {
        while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
        dq.addLast(i)
        if (dq.peekFirst <= i - w) dq.pollFirst()
        if (i >= w - 1) seen.add(hs(dq.peekFirst))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
