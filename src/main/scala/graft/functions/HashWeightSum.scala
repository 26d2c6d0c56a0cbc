package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Feature-hashing weight sum as ONE native Catalyst expression:
  * `hash_weight_sum(toks, dim)` = Σ over tokens of
  * ((first 32 bits of md5(token)) mod dim) mod 13 − 6 — bit-identical to
  * the composed `aggregate(toks, 0L, (a, w) -> a +
  * ((conv(substring(md5(w), 1, 8), 16, 10) % dim) % 13 - 6))` (8 hex
  * chars = the digest's first 4 bytes big-endian, unsigned, so both mods
  * act on a non-negative value), evaluated as one digest per token over
  * the raw bytes instead of an interpreted lambda frame with an
  * md5-to-hex string and a base-16 parse per token. O(len) per document,
  * inside whole-stage codegen — the scoring half of the fastText-style
  * hash classifier runs at scan speed.
  */
case class HashWeightSum(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if dim > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"hash_weight_sum requires dim > 0, got $dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_weight_sum requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hash_weight_sum"

  override def nullSafeEval(input: Any): Any =
    HashWeightSum.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashWeightSum.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashWeightSum =
    copy(child = newChild)
}

object HashWeightSum {

  /** SQL-registration builder; dim must be a foldable integer literal. */
  def forArgs(exprs: Seq[Expression]): HashWeightSum = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"hash_weight_sum takes (toks, dim); got ${exprs.size} arguments")
    val d = exprs(1) match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"hash_weight_sum: dim must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "hash_weight_sum: dim must be an integer literal, not a column")
    }
    HashWeightSum(exprs.head, d)
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(toks: ArrayData, dim: Int): Long = {
    val n = toks.numElements()
    var sum = 0L
    if (n > 0) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        val d = md.digest()
        // First 4 digest bytes big-endian = the 8-hex-char conv() value;
        // 32 bits in a long, so non-negative and % is a true mod.
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        sum += (h % dim) % 13 - 6
        i += 1
      }
    }
    sum
  }
}
