package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}

/** Hashed-bigram bucket counts as ONE native Catalyst expression:
  * `bigram_bucket_counts(toks, buckets)` maps a token array to
  * {bucket → occurrence count} over its adjacent word pairs, where
  * bucket = (first 56 bits of md5("w1 w2")) mod buckets — bit-identical
  * to the composed `conv(substring(md5(concat(w1, ' ', w2)), 1, 14),
  * 16, 10) % buckets` (14 hex chars = the digest's first 7 bytes,
  * parsed big-endian, always non-negative).
  *
  * The composed SQL form paid, per bigram OCCURRENCE: a concat
  * allocation, an md5-to-hex string, a substring, and a base-16 string
  * parse — all inside an exploded 1-row-per-occurrence stream. This
  * kernel runs one digest per pair directly over the token bytes (one
  * reused MessageDigest per document), takes the bucket from the raw
  * digest bytes, and pre-collapses the per-document counts row-locally,
  * so the downstream explode emits one row per DISTINCT bucket per
  * document. O(len) per document, inside whole-stage codegen.
  */
case class BigramBuckets(child: Expression, buckets: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if buckets > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"bigram_bucket_counts requires buckets > 0, got $buckets")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_bucket_counts requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def prettyName: String = "bigram_bucket_counts"

  override def nullSafeEval(input: Any): Any =
    BigramBuckets.compute(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramBuckets.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): BigramBuckets =
    copy(child = newChild)
}

object BigramBuckets {

  /** SQL-registration builder; buckets must be a foldable integer literal. */
  def forArgs(exprs: Seq[Expression]): BigramBuckets = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"bigram_bucket_counts takes (toks, buckets); got ${exprs.size} arguments")
    val b = exprs(1) match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"bigram_bucket_counts: buckets must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "bigram_bucket_counts: buckets must be an integer literal, not a column")
    }
    BigramBuckets(exprs.head, b)
  }

  private val Space = ' '.toByte

  /** Referenced from generated code — keep public and stable. */
  def compute(toks: ArrayData, buckets: Int): MapData = {
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    if (n >= 2) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i + 1 < n) {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        md.update(Space)
        md.update(toks.getUTF8String(i + 1).getBytes)
        val d = md.digest()
        // First 7 digest bytes big-endian = the 14-hex-char conv() value;
        // 56 bits, so always non-negative and % is a true mod.
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        val key = java.lang.Long.valueOf(h % buckets)
        val slot = counts.get(key)
        if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
        i += 1
      }
    }
    val ks = new Array[Long](counts.size)
    val vs = new Array[Long](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ks(i) = e.getKey
      vs(i) = e.getValue()(0)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
}
