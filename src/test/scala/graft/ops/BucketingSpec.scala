package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}

/** The point of bucketed storage is the EXCHANGE-FREE recurring join: both
  * sides pre-hash-partitioned on disk with the same bucket count, so the
  * planner's distribution requirement is already satisfied by the scans.
  * This spec proves it from the executed plan, not from documentation.
  */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed equi-join runs with zero Exchange operators and exact rows") {
    val orders = Tables.t(spark, sf0001, "orders")
    val customer = Tables.t(spark, sf0001, "customer")
    Bucketing.writeBucketed(orders, "bkt_orders", "o_custkey", 8)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "bkt_customer",
      "o_custkey", 8)
    // Force the shuffle-join path (broadcast off, AQE off so the static
    // executed plan is assertable) — the co-located layout must stand on
    // its own, without AQE rescuing the plan at runtime.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.bucketedEquiJoin(spark, "bkt_orders", "bkt_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.linesIterator.take(12).mkString("\n")}")
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(3).mkString("\n"))
      // Same rows as the plain (shuffling) join over the raw parquet.
      val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(joined.count() == expected)
    }
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
  }
}
