package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark SQL lacks natively.
  *
  * Implemented by composition (preference (a) over a custom SparkPlan):
  * tag and union both sides, sort within each key by (time, side), and
  * carry the last-seen right payload forward with an ignore-nulls `last`
  * window. One shuffle on the join key, no per-row range probe, no
  * fan-out — the standard scalable formulation (cost O((|L|+|R|) log) per
  * partition vs a range join's quadratic worst case), so it holds at
  * 100 TB where a broadcast range join cannot.
  *
  * Semantics: for each left row, the right row with the greatest
  * `rightTime <= leftTime` for the same key (inclusive); among right rows
  * with equal times, the greatest `payload.head` wins — pass a unique id
  * column first for deterministic results.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val pAliases = payload.map(c => s"_asof_$c")

    val r = right.select(
      col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(1).as("_side") +:
        payload.zip(pAliases).map { case (c, a) => col(c).as(a) }: _*)
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(2))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // Right rows sort before left rows at equal time (inclusive <=); the
    // first payload column breaks ties among simultaneous right rows.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col(pAliases.head))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = pAliases.foldLeft(unioned) { (df, a) =>
      df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("_side") === 2)
      .drop("_k", "_t", "_side")
  }
}
