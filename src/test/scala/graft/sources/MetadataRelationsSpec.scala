package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.gateway.{ConnectionConfig, Engine}

/** iceberg_metadata() / iceberg_snapshots() as queryable relations — the
  * reference's own probe SQL (main.py:503-512) must run against them.
  */
class MetadataRelationsSpec extends AnyFunSuite with SparkFixture {

  private val cfg = ConnectionConfig("minio", "e", "k", "s")

  private lazy val table: String = {
    val dir = tmpDir("metarel") + "/warehouse/region"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    IcebergLiteWriter.append(spark, Tables.t(spark, sf0001, "region"), dir)
    dir
  }

  test("the reference's manifest aggregate runs against iceberg_metadata()") {
    val r = Engine.executeQuery(spark,
      s"""SELECT
         |  COALESCE(SUM(record_count), 0) AS rows,
         |  COUNT(*) AS files,
         |  BOOL_OR(manifest_content <> 'DATA') AS has_deletes
         |FROM iceberg_metadata('$table')""".stripMargin, cfg)
    assert(r.columns == Seq("rows", "files", "has_deletes"))
    assert(r.rows.head(0) == 10L)
    assert(r.rows.head(2) == false)
  }

  test("iceberg_snapshots() exposes the snapshot log with current flag") {
    val r = Engine.executeQuery(spark,
      s"SELECT snapshot_id, is_current FROM iceberg_snapshots('$table') ORDER BY committed_at",
      cfg)
    assert(r.rows.length == 2)
    assert(r.rows.map(_(1)) == Seq(false, true))
  }

  test("iceberg_files() exposes per-file stats; iceberg_partitions() rolls them up") {
    // Partitioned table: two writes, partitions split the region rows.
    val dir = tmpDir("metarel_files") + "/warehouse/region_files"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir,
      partitionBy = Seq("r_regionkey"))
    val files = Engine.executeQuery(spark,
      s"""SELECT COUNT(*) AS n, SUM(record_count) AS rows, MIN(file_size_bytes) AS min_b
         |FROM iceberg_files('$dir')""".stripMargin, cfg)
    assert(files.rows.head(1) == 5L)             // all region rows accounted for
    assert(files.rows.head(0).asInstanceOf[Long] >= 5L) // one file per regionkey partition
    assert(files.rows.head(2).asInstanceOf[Long] > 0L)
    // The partitions rollup: one row per partition tuple, totals match.
    val parts = Engine.executeQuery(spark,
      s"""SELECT COUNT(*) AS n_parts, SUM(file_count) AS files, SUM(record_count) AS rows
         |FROM iceberg_partitions('$dir')""".stripMargin, cfg)
    assert(parts.rows.head(0) == 5L)
    assert(parts.rows.head(2) == 5L)
    // Per-partition keys ride as a queryable map column.
    val one = Engine.executeQuery(spark,
      s"""SELECT partition['r_regionkey'] AS k, record_count
         |FROM iceberg_partitions('$dir') ORDER BY k""".stripMargin, cfg)
    assert(one.rows.map(_(0)) == Seq("0", "1", "2", "3", "4"))
    assert(one.rows.forall(_(1) == 1L))
  }

  test("delete table shows DELETE manifest content") {
    val dir = tmpDir("metarel_del") + "/warehouse/t"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir,
      withDeleteManifest = true)
    val r = Engine.executeQuery(spark,
      s"SELECT BOOL_OR(manifest_content <> 'DATA') AS has_deletes FROM iceberg_metadata('$dir')",
      cfg)
    assert(r.rows.head.head == true)
  }
}
