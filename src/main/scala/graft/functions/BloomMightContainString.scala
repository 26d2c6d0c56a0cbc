package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built Bloom filter — the
  * broadcast-sketch prefilter for decontamination/dedup joins: the small
  * side's key set is sketched once (a few MB even at 10^8 keys), shipped
  * to every task inside the serialized expression (`addReferenceObj`,
  * exactly how Spark's own runtime-filter BloomFilterMightContain rides
  * along), and the big side drops non-candidate rows at scan speed BEFORE
  * the shuffle — the join then only re-verifies the survivors, so false
  * positives never reach the result. Stays inside whole-stage codegen;
  * no UDF serialization per row.
  */
case class BloomMightContainString(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string argument, got ${child.dataType.catalogString}")

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainString =
    copy(child = newChild)
}
