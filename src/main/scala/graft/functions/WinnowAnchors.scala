package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Position-carrying winnowing: `winnow_anchors(text, k, w)` returns the
  * distinct `(min-hash << 32) | gramPos` packings of each w-window of
  * consecutive char-k-gram hashes — [[WinnowHashes]] plus WHERE each
  * selected fingerprint sits, which is what exact-substring dedup needs:
  * the position lets the verifier compare the literal k-gram characters
  * (never the whole document) across candidate pairs.
  *
  * Selection is the LEFTMOST minimal hash of each window (ties keep the
  * earlier gram), chosen because it is the rule an external engine can
  * reproduce with a first-occurrence `list_indexof` — the determinism
  * contract the oracle relies on. `gramPos` is the 1-based code-point
  * index of the gram's first character, so `substr(text, pos, k)` in any
  * 1-based engine recovers the anchored gram. Hash < 2^30 and positions
  * < 2^32 keep the packing inside a positive int64.
  *
  * Same O(len)-per-document shape as [[WinnowHashes]]: rolling polynomial
  * k-gram hash + monotonic-deque window minima, one codegen'd call.
  */
case class WinnowAnchors(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_anchors requires a string argument, got ${child.dataType.catalogString}")
    else if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(s"winnow_anchors requires k >= 1 and w >= 1, got ($k, $w)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_anchors"

  override def nullSafeEval(input: Any): Any =
    WinnowAnchors.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowAnchors.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

object WinnowAnchors {

  /** SQL-registration builder; k and w must be foldable integer literals. */
  def forArgs(exprs: Seq[Expression]): WinnowAnchors = {
    if (exprs.size != 3)
      throw new IllegalArgumentException(
        s"winnow_anchors takes (text, k, w); got ${exprs.size} arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"winnow_anchors: $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"winnow_anchors: $name must be an integer literal, not a column")
    }
    WinnowAnchors(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "w"))
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
    // Distinct (hash, leftmost-argmin position) packings, first-occurrence
    // order. Position is the 1-based gram index.
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def pack(idx: Int): Long = (hs(idx) << 32) | (idx + 1).toLong
    if (numGrams <= w) {
      var best = 0
      var i = 1
      while (i < numGrams) { if (hs(i) < hs(best)) best = i; i += 1 }
      seen.add(pack(best))
    } else {
      // Monotonic deque of candidate indices; the pop is STRICT (>) so an
      // equal later hash queues behind the earlier one and the front stays
      // the window's leftmost minimum — [[WinnowHashes]] pops >= because
      // it only needs the value. O(numGrams) total.
      val dq = new java.util.ArrayDeque[Integer]()
      var i = 0
      while (i < numGrams) {
        while (!dq.isEmpty && hs(dq.peekLast) > hs(i)) dq.pollLast()
        dq.addLast(i)
        if (dq.peekFirst <= i - w) dq.pollFirst()
        if (i >= w - 1) seen.add(pack(dq.peekFirst))
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
