package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Filtered term frequencies as ONE native Catalyst expression:
  * `term_counts(toks, array('a', 'b', …))` maps a token array to
  * {term → occurrence count} restricted to the literal term set — the
  * row-local form of the posting-list slice (explode → IN-filter →
  * (doc, term) count aggregate) a multi-query retrieval pass starts
  * from.
  *
  * The composed form paid an interpreted lambda (higher-order `filter`
  * never enters whole-stage codegen) plus a per-occurrence explode and a
  * corpus-keyed count aggregate. This kernel is one hashed-set probe per
  * token inside codegen, emits one map entry per DISTINCT matched term,
  * and makes the downstream (doc, term, tf) relation explode-ready with
  * no aggregate at all. O(len) per document.
  */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {

  @transient private lazy val termSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, terms.size * 2))
    terms.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // An empty term set is legal and returns an empty map — callers
    // composing the term list dynamically (bm25TopK with no queries)
    // must not fail at analysis time.
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "term_counts"

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[ArrayData], termSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termSet", termSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  /** SQL-registration builder; the term set must be a foldable array of
    * string literals.
    */
  def forArgs(exprs: Seq[Expression]): TermCounts = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"term_counts takes (toks, array_of_terms); got ${exprs.size} arguments")
    val ts = exprs(1) match {
      case l if l.foldable => l.eval() match {
        case a: ArrayData =>
          (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(
          s"term_counts: terms must be an array literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "term_counts: terms must be an array literal, not a column")
    }
    TermCounts(exprs.head, ts)
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(toks: ArrayData, terms: java.util.HashSet[UTF8String]): MapData = {
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (terms.contains(t)) {
        val slot = counts.get(t)
        // clone(): the getUTF8String view may point into a buffer the
        // scan reuses for the next row; map keys outlive this row only
        // until the MapData below copies... it does NOT — GenericArrayData
        // holds the reference, so the key must own its bytes.
        if (slot == null) counts.put(t.clone(), Array(1L)) else slot(0) += 1L
      }
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
