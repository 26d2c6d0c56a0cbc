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
}
