package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering —
  * the layout optimization behind "z-ordered" table maintenance in modern
  * lakehouse engines. Interleaving the bits of two sort keys makes rows
  * that are close in BOTH dimensions land close in the one-dimensional
  * z-value order, so range-partitioning + sorting by z-value clusters
  * parquet files such that a predicate on EITHER dimension (or a box on
  * both) prunes most files via min/max statistics — a plain lexicographic
  * sort only prunes on its leading column.
  *
  * The interleave is the classic magic-number bit spread — a handful of
  * codegen-friendly shifts/masks per row, no UDF. All arithmetic is on
  * int64 with values <= 2^32, reproducible on any engine that has
  * shift/and/or (the corpus oracle replays it in DuckDB).
  */
object ZOrder {

  /** Spread the low 16 bits of x so bit i lands at position 2i
    * (0b1111 -> 0b01010101). Intermediate masks keep everything in the
    * low 32 bits of a long.
    */
  private def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of (a, b): a's bits at even positions, b's at odd.
    * Inputs are taken modulo 2^16 (callers with wider domains should
    * pre-scale into 16 bits — for file clustering, relative order within
    * 65k buckets per dimension is what matters, not full precision).
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Rewrite df clustered by the z-order of (a, b): range-partition on the
    * z-value (so each output file owns a contiguous z-range = a rectangle
    * hierarchy in (a, b) space) and sort within partitions (so parquet
    * row-group min/max stats are tight inside each file). numFiles sizes
    * the output — at 100 TB this is the compaction parallelism, not a
    * driver-side constant to fear. The z column is dropped before write.
    */
  def clusterWrite(df: DataFrame, a: Column, b: Column,
      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
