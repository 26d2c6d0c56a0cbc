package graft.gateway

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.sources.IcebergLiteWriter

/** SURVEY.md §7.7 #1: per-request isolation on a shared JVM is the analog
  * of the concurrency bug the reference fixed (main.py:262-272) and needs a
  * dedicated concurrent test: parallel requests binding different
  * iceberg_scan views must not corrupt each other's results.
  */
class ConcurrencySpec extends AnyFunSuite with SparkFixture {

  private val cfg = ConnectionConfig("minio", "e", "k", "s")

  test("16 concurrent requests over distinct tables see only their own data") {
    // Two tables with disjoint contents.
    val dirA = tmpDir("conc_a") + "/warehouse/a"
    val dirB = tmpDir("conc_b") + "/warehouse/b"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dirA)
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "nation"), dirB)

    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(16))
    val futures = (0 until 16).map { i =>
      Future {
        val (dir, expected) = if (i % 2 == 0) (dirA, 5L) else (dirB, 25L)
        val r = Engine.executeQuery(
          spark, s"SELECT COUNT(*) AS n FROM iceberg_scan('$dir')", cfg)
        (i, r.rows.head.head, expected)
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (i, got, expected) =>
      assert(got == expected, s"request $i saw $got, expected $expected")
    }
  }

  test("concurrent mixed valid/invalid requests: failures never bleed") {
    val dir = tmpDir("conc_mix") + "/warehouse/t"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(8))
    val futures = (0 until 12).map { i =>
      Future {
        if (i % 3 == 2)
          intercept[Engine.EngineError](
            Engine.executeQuery(spark, "DROP TABLE x", cfg)).status == 400
        else
          Engine.executeQuery(spark,
            s"SELECT COUNT(*) AS n FROM iceberg_scan('$dir')", cfg)
            .rows.head.head == 5L
      }
    }
    assert(Await.result(Future.sequence(futures), 120.seconds).forall(identity))
  }

  test("same-bucket different-credential requests keep isolated credentials") {
    // SURVEY.md §7.3's hard part: two concurrent requests carrying
    // DIFFERENT credentials for the SAME bucket. Storage settings are
    // per-session (spark.hadoop.* on the request session's conf), and the
    // Iceberg-lite metadata chain reads through the session merge — so
    // each request resolves its own key and the process-global Hadoop
    // configuration is never touched.
    val dir = tmpDir("conc_cred") + "/warehouse/t"
    IcebergLiteWriter.write(spark, Tables.t(spark, sf0001, "region"), dir)
    val globalKey = "fs.s3a.bucket.shared.access.key"
    assert(spark.sparkContext.hadoopConfiguration.get(globalKey) == null)

    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(16))
    val futures = (0 until 16).map { i =>
      Future {
        val cfgI = ConnectionConfig("minio", "http://localhost:9000",
          s"AK$i", s"SK$i", tablePath = Some("s3://shared/warehouse/t"))
        // The isolation boundary itself: apply request i's settings on its
        // own session, yield to let the other requests race, then read the
        // credential back through the session's merged Hadoop view.
        val sess = spark.newSession()
        Engine.applyStorageSettings(sess, ConnectionConfig.validated(cfgI))
        Thread.sleep((i % 4) * 5L)
        val seen = graft.sources.IcebergLite.sessionHadoopConf(sess).get(globalKey)
        // Full request path with the same config (its own newSession
        // inside): still answers correctly while 15 others run.
        val r = Engine.executeQuery(
          spark, s"SELECT COUNT(*) AS n FROM iceberg_scan('$dir')", cfgI)
        (i, seen, r.rows.head.head)
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (i, seen, n) =>
      assert(seen == s"AK$i", s"request $i resolved credential $seen")
      assert(n == 5L, s"request $i got $n rows")
    }
    // No request leaked its credentials into process-global state.
    assert(spark.sparkContext.hadoopConfiguration.get(globalKey) == null)
  }
}
