package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.sql.Column

/** Bounded top-k accumulator over (score, id) pairs, ordered score-desc then
  * id-asc (a total order, so the result is deterministic under any partial
  * aggregation / merge order).
  *
  * This is the scale-safe formulation of per-group top-k: partial
  * aggregation keeps every map-side buffer at <= k entries, so ranking a
  * scored set shuffles only #partitions * k rows per group instead of
  * funneling the entire scored set into one reducer per group the way
  * `Window.partitionBy(group).orderBy(score)` does. With few groups
  * (ANN queries) and a 100 TB corpus, the window formulation is a skew
  * bottleneck; this one is flat.
  *
  * Mirrors the reference's top-k result semantics (cloudfloe surfaces
  * ORDER BY/LIMIT through DuckDB); the bounded-heap shape is ours.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert into a buffer kept sorted best-first and capped at k. */
  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front ::: x :: back).take(k)
    }
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(buf, x)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

object TopKByScore {
  /** `topK(k)(score, id)` aggregate column; explode with [[ranked]]. */
  def topK(k: Int)(score: Column, id: Column): Column =
    F.udaf(new TopKByScore(k)).apply(score, id)
}
