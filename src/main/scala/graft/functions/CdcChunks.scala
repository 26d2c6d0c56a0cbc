package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (LBFS, Muthitacharoen et al. 2001; the
  * FastCDC family) as ONE native Catalyst expression:
  * `cdc_chunks(text, k, div)` splits a document at every position whose
  * char-k-gram rolling hash is ≡ 0 (mod div) — a boundary decided ONLY
  * by the k code points ending at it, so an insertion early in a
  * document shifts at most one chunk's boundaries instead of re-cutting
  * everything after it (the property fixed-width chunking lacks, and
  * the reason storage dedup uses content-defined cuts).
  *
  * The gram hash is the [[RollingHash]] polynomial
  * `sum(cp_j * 31^(k-j)) mod 1e9+7` slid in O(1) per position — the
  * identical hash [[WinnowHashes]] slides, so the oracle's unrolled
  * 8-coefficient form replays it bit-for-bit. Cuts land AFTER the gram's
  * last code point; a document shorter than k (or with no qualifying
  * gram) is one whole-text chunk; a cut at the exact end adds no empty
  * trailing chunk. Expected chunk length ≈ div + k chars.
  */
case class CdcChunks(child: Expression, k: Int, div: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks requires a string argument, got ${child.dataType.catalogString}")
    else if (k < 1 || div < 1)
      TypeCheckResult.TypeCheckFailure(s"cdc_chunks requires k >= 1 and div >= 1, got ($k, $div)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], k, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c, $k, $div)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** SQL-registration builder; k and div must be foldable integer literals. */
  def forArgs(exprs: Seq[Expression]): CdcChunks = {
    if (exprs.size != 3)
      throw new IllegalArgumentException(
        s"cdc_chunks takes (text, k, div); got ${exprs.size} arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"cdc_chunks: $name must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        s"cdc_chunks: $name must be an integer literal, not a column")
    }
    CdcChunks(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "div"))
  }

  import RollingHash.Mod

  /** Referenced from generated code — keep public and stable. */
  def compute(text: UTF8String, k: Int, div: Int): ArrayData = {
    val str = text.toString
    // Code points (matching RollingHash / DuckDB unicode()) with each
    // point's char offset, so chunk substrings stay correct past BMP.
    val m0 = str.codePointCount(0, str.length)
    val cps = new Array[Int](m0)
    val charAt = new Array[Int](m0 + 1)
    var ci = 0
    var t = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(t) = cp
      charAt(t) = ci
      ci += Character.charCount(cp)
      t += 1
    }
    charAt(m0) = str.length
    val out = new java.util.ArrayList[UTF8String]()
    if (m0 < k) {
      out.add(UTF8String.fromString(str))
    } else {
      var h = 0L
      t = 0
      while (t < k) { h = (h * 31 + cps(t)) % Mod; t += 1 }
      var pk = 1L
      var e = 0
      while (e < k - 1) { pk = pk * 31 % Mod; e += 1 }
      var prev = 0 // exclusive code-point end of the last emitted chunk
      var i = 0
      val numGrams = m0 - k + 1
      while (i < numGrams) {
        if (h % div == 0) {
          val cut = i + k
          out.add(UTF8String.fromString(str.substring(charAt(prev), charAt(cut))))
          prev = cut
        }
        if (i + 1 < numGrams)
          h = ((h - cps(i) * pk % Mod + Mod) % Mod * 31 + cps(i + k)) % Mod
        i += 1
      }
      if (prev < m0)
        out.add(UTF8String.fromString(str.substring(charAt(prev), str.length)))
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }
}
