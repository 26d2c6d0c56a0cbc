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
