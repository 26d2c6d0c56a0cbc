package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.sql.Column

/** Bounded "first k of a sequence" accumulator: keeps the payloads of the
  * k smallest (seq, id) rows, returned in (seq, id)-ascending order — the
  * head-of-sequence counterpart to [[TopKByScore]]'s top-k.
  *
  * Scale shape: per-group state is capped at 2k entries — the buffer
  * accumulates unsorted and is pruned to the k smallest whenever it
  * reaches 2k (amortized O(log k) per row, O(1) when the group is under
  * the cap), and partial buffers merge by concatenate-and-prune. A
  * `collect_list` of the full sequence, by contrast, materializes the
  * whole group — a bot account with 10^8 events is a single-group
  * executor OOM. (seq, id) must be a total order (id breaks seq ties)
  * for the result to be deterministic under any partial-aggregation
  * split.
  */
class FirstKBySeq(k: Int)
    extends Aggregator[(Long, Long, String), (Int, List[(Long, Long, String)]), Seq[String]] {

  private val ord: Ordering[(Long, Long, String)] = Ordering.by(t => (t._1, t._2))

  private def prune(n: Int, xs: List[(Long, Long, String)]): (Int, List[(Long, Long, String)]) =
    if (n <= k) (n, xs) else (k, xs.sorted(ord).take(k))

  override def zero: (Int, List[(Long, Long, String)]) = (0, Nil)

  override def reduce(b: (Int, List[(Long, Long, String)]),
      x: (Long, Long, String)): (Int, List[(Long, Long, String)]) = {
    val n = b._1 + 1
    val xs = x :: b._2
    if (n >= 2 * k) prune(n, xs) else (n, xs)
  }

  override def merge(a: (Int, List[(Long, Long, String)]),
      b: (Int, List[(Long, Long, String)])): (Int, List[(Long, Long, String)]) =
    prune(a._1 + b._1, a._2 ::: b._2)

  override def finish(b: (Int, List[(Long, Long, String)])): Seq[String] =
    b._2.sorted(ord).take(k).map(_._3)

  override def bufferEncoder: Encoder[(Int, List[(Long, Long, String)])] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object FirstKBySeq {
  /** `firstK(k)(seq, id, payload)`: payloads of the k smallest (seq, id)
    * rows, (seq, id)-ascending.
    */
  def firstK(k: Int)(seq: Column, id: Column, payload: Column): Column =
    F.udaf(new FirstKBySeq(k)).apply(seq, id, payload)
}
