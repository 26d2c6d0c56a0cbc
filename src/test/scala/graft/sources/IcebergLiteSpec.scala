package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.Tables

/** Mirrors /root/reference/backend/tests/test_connection_probing.py against
  * the IcebergLite metadata chain (fixture written by IcebergLiteWriter).
  */
class IcebergLiteSpec extends AnyFunSuite with SparkFixture {

  private lazy val table: String = {
    val dir = tmpDir("iceberg_region") + "/warehouse/region"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    dir
  }

  private lazy val deleteTable: String = {
    val dir = tmpDir("iceberg_del") + "/warehouse/region_del"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir,
      withDeleteManifest = true)
    dir
  }

  test("probe returns format, snapshot, rows, files, no deletes") {
    val info = IcebergLite.probe(spark, table)
    assert(info.format.contains("iceberg-v2"))
    assert(info.rows.contains(5L))
    assert(info.files.exists(_ >= 1L))
    assert(info.hasDeletes.contains(false))
    // 64-bit snapshot ids are stringified at the JSON edge.
    assert(info.snapshotId.exists(s => s.nonEmpty && s.forall(_.isDigit)))
    assert(info.lastSnapshotAt.exists(t => t.contains("T") && t.endsWith("Z")))
    assert(info.suggestedQuery.contains("iceberg_scan"))
  }

  test("scan reads the table's data files") {
    val df = IcebergLite.scan(spark, table)
    assert(df.count() == 5)
    assert(df.columns.toSet == Set("r_regionkey", "r_name"))
  }

  test("delete manifests are detected and the guard blocks") {
    assert(IcebergLite.hasDeletes(spark.sparkContext.hadoopConfiguration, deleteTable))
    val e = intercept[IcebergLite.DeleteGuardError](
      IcebergLite.assertNoDeletes(spark, deleteTable))
    assert(e.message.contains("row-level deletes"))
    assert(IcebergLite.probe(spark, deleteTable).hasDeletes.contains(true))
  }

  test("clean table passes the guard") {
    IcebergLite.assertNoDeletes(spark, table)
  }

  test("probe of a non-table path fails") {
    intercept[IcebergLite.ProbeError](
      IcebergLite.probe(spark, tmpDir("not_a_table")))
  }

  test("guard degrades (does not block) when metadata is unreadable") {
    IcebergLite.assertNoDeletes(spark, tmpDir("nothing_here"))
  }

  test("manifest sub-probe degradation keeps metadata-json fields") {
    val dir = tmpDir("iceberg_degraded") + "/warehouse/t"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    // Corrupt the manifest list -> manifest aggregate fails, JSON probe ok.
    val metaDir = Paths.get(dir.stripPrefix("file:"), "metadata")
    Files.list(metaDir).filter(_.getFileName.toString.startsWith("snap-"))
      .forEach(p => Files.write(p, Array[Byte](1, 2, 3)))
    val info = IcebergLite.probe(spark, dir)
    assert(info.format.contains("iceberg-v2"))
    assert(info.snapshotId.nonEmpty)
    assert(info.rows.isEmpty && info.files.isEmpty)
  }

  test("latest metadata json wins by filename order") {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = IcebergLite.latestMetadataPath(conf, table)
    assert(p.exists(_.getName.endsWith(".metadata.json")))
  }
}
