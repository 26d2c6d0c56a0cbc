package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-word-pair counts as ONE native Catalyst expression:
  * `pair_counts(toks)` maps a token array to {"w1 w2" → occurrence
  * count} over its adjacent pairs — the row-local head of the
  * bigram-LM family (p78/p80/p90), replacing the per-occurrence
  * struct-transform + explode whose lambda frames ran interpreted.
  *
  * The pair key is the space-joined bigram (tokens are split on the
  * space, so the first space in the key always separates w1 from w2 —
  * `substring_index(pair, ' ', 1)` recovers the context word exactly).
  * Counts collapse per document before anything explodes, so the
  * exploded stream is one row per DISTINCT pair per document and the
  * within-document duplication never crosses an exchange. O(len) per
  * document, inside whole-stage codegen.
  */
case class PairCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_counts requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "pair_counts"

  override def nullSafeEval(input: Any): Any =
    PairCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PairCounts =
    copy(child = newChild)
}

object PairCounts {

  private val Space = UTF8String.fromString(" ")

  /** Referenced from generated code — keep public and stable. */
  def compute(toks: ArrayData): MapData = {
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i + 1 < n) {
      // concat allocates the pair's own bytes, so the key is safe to
      // retain beyond the scan's buffer reuse.
      val pair = UTF8String.concat(toks.getUTF8String(i), Space, toks.getUTF8String(i + 1))
      val slot = counts.get(pair)
      if (slot == null) counts.put(pair, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val ks = new Array[AnyRef](counts.size)
    val vs = new Array[Long](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = e.getKey
      vs(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
}
