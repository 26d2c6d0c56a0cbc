package graft

import org.apache.spark.sql.SparkSession

/** Temporary r12 probe — deleted before round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf100x")
    val df = SparkEntry.queries("p100_robust_scale")(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Generate") || l.contains("HashAggregate(keys=[pos") || l.contains("Scan parq"))
      .take(8).foreach(println)
  }
}
