package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.gateway.{ConnectionConfig, Engine}

/** Snapshot time travel: append creates a second snapshot; scans at the old
  * snapshot id see the old data (reference capability surface, reference
  * README.md:197 "Time travel queries via snapshots").
  */
class TimeTravelSpec extends AnyFunSuite with SparkFixture {

  private lazy val table: String = {
    val dir = tmpDir("tt") + "/warehouse/region"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    IcebergLiteWriter.append(spark,
      Tables.t(spark, sf0001, "region").withColumn("r_regionkey", col("r_regionkey") + 100),
      dir)
    dir
  }

  private def snapshotIds: Seq[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = IcebergLite.readMetadataJson(
      conf, IcebergLite.latestMetadataPath(conf, table).get)
    meta.get("snapshots").collect {
      case graft.gateway.JValue.JArr(items) =>
        items.collect { case o: graft.gateway.JValue.JObj =>
          o.get("snapshot-id").collect { case graft.gateway.JValue.JNum(n) => n.toLong }.get
        }
    }.get
  }

  test("append produces a second snapshot; latest scan sees both batches") {
    assert(snapshotIds.length == 2)
    assert(IcebergLite.scan(spark, table).count() == 10)
  }

  test("scan at the first snapshot id sees only the original rows") {
    val first = snapshotIds.head
    val df = IcebergLite.scan(spark, table, Some(first))
    assert(df.count() == 5)
    assert(df.agg(max(col("r_regionkey"))).head.getInt(0) < 100)
  }

  test("probe reports the latest snapshot after append") {
    val info = IcebergLite.probe(spark, table)
    assert(info.snapshotId.contains(snapshotIds.last.toString))
    assert(info.rows.contains(10L))
  }

  test("iceberg_scan('p', snapshot_id => N) travels through the SQL surface") {
    val cfg = ConnectionConfig("minio", "e", "k", "s")
    val first = snapshotIds.head
    val old = Engine.executeQuery(spark,
      s"SELECT COUNT(*) AS n FROM iceberg_scan('$table', snapshot_id => $first)", cfg)
    assert(old.rows.head.head == 5L)
    val cur = Engine.executeQuery(spark,
      s"SELECT COUNT(*) AS n FROM iceberg_scan('$table')", cfg)
    assert(cur.rows.head.head == 10L)
    val positional = Engine.executeQuery(spark,
      s"SELECT COUNT(*) AS n FROM iceberg_scan('$table', $first)", cfg)
    assert(positional.rows.head.head == 5L)
  }
}
