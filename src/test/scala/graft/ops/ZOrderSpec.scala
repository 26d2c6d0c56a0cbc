package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Z-order clustering is only worth its rewrite cost if file-level min/max
  * stats actually prune multi-dimensional predicates. This spec checks the
  * bit interleave exactly and then measures pruning effectiveness on the
  * files clusterWrite produced — against what a file would have to read
  * without clustering.
  */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  test("morton interleave puts a's bits at even and b's at odd positions") {
    import spark.implicits._
    val rows = Seq((3L, 0L), (0L, 3L), (0xFFFFL, 0L), (0L, 0xFFFFL), (5L, 6L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // 3 -> 0b101; interleaved at even positions = 5; at odd = 10.
    assert(rows(0) == 5L)
    assert(rows(1) == 10L)
    assert(rows(2) == 0x55555555L)
    assert(rows(3) == 0xAAAAAAAAL)
    // a=5 (0b101): spread = 0b010001 = 17; b=6 (0b110): spread = 0b010100
    // = 20, shifted = 40; z = 17 | 40 = 57.
    assert(rows(4) == 57L)
  }

  test("z-clustered files prune a 2-d box predicate that a 1-d sort cannot") {
    import spark.implicits._
    // A 64x64 grid, one row per cell; 16 output files = ~16x16 z-tiles.
    val grid = spark.range(4096)
      .select((col("id") % 64).as("a"), expr("id div 64").as("b"))
    val dir = tmpDir("zorder") + "/clustered"
    ZOrder.clusterWrite(grid, col("a"), col("b"), 16, dir)

    val back = spark.read.parquet(dir)
    assert(back.count() == 4096L)

    // Per-file min/max of both dimensions — what parquet footer pruning
    // would consult.
    val stats = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("a").as("mina"), max("a").as("maxa"),
        min("b").as("minb"), max("b").as("maxb"))
      .collect()
    val total = stats.length
    assert(total >= 8, s"expected ~16 files, got $total")

    def hits(aLo: Long, aHi: Long, bLo: Long, bHi: Long): Int =
      stats.count(r => r.getLong(1) <= aHi && r.getLong(2) >= aLo &&
        r.getLong(3) <= bHi && r.getLong(4) >= bLo)

    // A 16x16 box (1/16 of the grid) must touch a small minority of files;
    // a 1-d sort by a would leave every predicate on b unprunable (every
    // file spans all of b), which is the failure mode z-ordering removes.
    val box = hits(0, 15, 0, 15)
    assert(box <= total / 2,
      s"box predicate hit $box of $total files — clustering isn't pruning")
    // Each single-dimension range predicate also prunes: a z-tile bounds
    // BOTH coordinates, so narrow ranges in either dimension skip files.
    assert(hits(0, 15, 0, 63) < total)
    assert(hits(0, 63, 0, 15) < total)
  }
}
