package graft.sources

import org.apache.spark.sql.SparkSession

/** Demo/ops tool: seed an Iceberg-lite table from a testdata table, or
  * append another snapshot to one.
  *
  * Usage: runMain graft.sources.Seed <sfDir> <tableName> <targetDir> [append]
  */
object Seed {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, tableName, targetDir, rest @ _*) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables.t(spark, sfDir, tableName)
    if (rest.contains("append")) IcebergLiteWriter.append(spark, df, targetDir)
    else IcebergLiteWriter.write(spark, df, targetDir)
    val info = IcebergLite.probe(spark, targetDir)
    println(s"seeded: $targetDir rows=${info.rows.getOrElse(-1L)} snapshot=${info.snapshotId.getOrElse("?")}")
    spark.stop()
  }
}
