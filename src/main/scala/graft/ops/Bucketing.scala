package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins — the storage-
  * layout answer to "this join shuffles 100 TB every night". Writing both
  * sides bucketed (and sorted) by the join key with the same bucket count
  * lets Spark's FileSourceScanExec expose the hash partitioning to the
  * planner: a subsequent equi-join on that key runs as a sort-merge join
  * with ZERO Exchange operators — each task reads bucket i of both tables.
  *
  * At scale: pay the shuffle once at ingest (the bucketed write), then
  * every recurring join/aggregation on the key is exchange-free. Bucket
  * count is fixed at write time — size it to the target cluster's task
  * granularity (e.g. data_size / 128 MB), not to today's executor count.
  */
object Bucketing {

  /** Write df as a bucketed+sorted managed parquet table. Bucketing
    * requires the table catalog (plain .parquet(path) writes cannot carry
    * bucket metadata), so this creates/replaces `table` in the session
    * catalog under spark.sql.warehouse.dir.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two tables previously written by [[writeBucketed]] with the
    * same bucket count on `key`. Planner note, verified in BucketingSpec:
    * the physical plan contains no ShuffleExchange on either side — the
    * scan's outputPartitioning (HashPartitioning(key, n)) already
    * satisfies the join's distribution requirement.
    */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
