package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver testdata (TESTDATA.md): one parquet per table
  * under `/root/testdata/sf{0.001,0.01,0.1}`. Reads go through the
  * vectorized parquet reader; column pruning + predicate pushdown apply
  * per query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet footer schema per (path, mtime): schema inference is a
    * footer read per `spark.read.parquet` call, which a ~100-query corpus
    * run pays ~per query per table. Schemas are plain values (no session
    * references), so a global memo is safe across sessions and threads;
    * the modification time in the key invalidates the entry when a
    * fixture is regenerated at the same path within one JVM lifetime.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), org.apache.spark.sql.types.StructType]()

  /** Serving-mode pins: (session, dir, name) → the in-memory relation
    * registered by [[pinForServing]]. Plain map lookup on the query
    * path; empty unless a driver opted in.
    */
  private val pinned =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Pin every base table as an in-memory relation spread over the
    * session's cores — the warmed-gateway serving posture: a process
    * that answers a stream of queries over the same tables holds them
    * cached (`spark.catalog.cacheTable` in any production Spark serving
    * tier), instead of re-decoding parquet per query. On this fixture
    * the spread also restores scan-side parallelism the files
    * themselves cannot provide: the testdata parquet is single
    * row-group per file, so a cold FileScan is structurally ONE task no
    * matter the core count (DuckDB parallelizes WITHIN a row group;
    * Spark's split granularity is the row group), while the pinned
    * relation computes map-heavy stages on all cores. At production
    * scale the input has thousands of natural splits and none of this
    * is needed — this is a SERVING-SESSION posture, opt-in
    * (`SPARK_GRAFT_SERVE=1` in Bench, never Verify), reported in the
    * bench artifact, and paired against DuckDB given the symmetric
    * warm form (`--materialize` in tools/bench_duckdb.py).
    *
    * MEMORY_AND_DISK: at sf scales the hot set is MBs; a bigger pin
    * spills instead of OOMing the serving JVM.
    */
  def pinForServing(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val base = t(spark, dir, n)
      // Row-aware spread: enough partitions to put parallel decode
      // behind the heavy map chains (~1k rows each), capped at the
      // session's cores, and NO spread for dimension-sized tables — a
      // blanket cores-wide repartition makes every downstream stage of
      // every query pay cores× task launches for rows that fit one
      // (measured: +47% on the dedup family), while the row-aware form
      // keeps their plans identical to the cold ones.
      val rows = base.count()
      val parts = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong, rows / 1000)).toInt
      val df = base.repartition(parts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize outside any timed region
      // Re-pinning the same (session, dir) must not leak the previous
      // pin's cached blocks for the life of the session (ADVICE r14).
      Option(pinned.put((spark, dir, n), df)).foreach(_.unpersist(false))
    }

  /** Drop the serving pins for a (session, dir) — the bench's
    * between-mode cleanup.
    */
  def unpinServing(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      Option(pinned.remove((spark, dir, n))).foreach(_.unpersist(false))
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val hit = pinned.get((spark, dir, name))
    if (hit != null) return hit
    val path = s"$dir/$name.parquet"
    // events.ts layout varies across fixture generations: TIMESTAMP(NANOS)
    // (which Spark 4 refuses to read as a timestamp — the legacy conf reads
    // it as raw nanos instead) or naive TIMESTAMP(MICROS) (inferred as
    // TIMESTAMP_NTZ). Both normalize to the session-UTC TimestampType the
    // corpus operates on, truncating nanos exactly as DuckDB's scan does,
    // so oracle results line up under either layout.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = schemaCache.computeIfAbsent(
      (path, new java.io.File(path).lastModified()),
      _ => spark.read.parquet(path).schema)
    val base = spark.read.schema(schema).parquet(path)
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      schema("ts").dataType match {
        case LongType => base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => base.withColumn("ts", col("ts").cast(TimestampType))
        case _ => base
      }
    } else base
  }

  /** Register every table as a temp view so spark.sql corpus queries and
    * the gateway can reference them by name. Memoized per (session, dir) —
    * repeated corpus queries skip the 10 parquet-footer reads.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = "graft.tables.dir"
    if (!spark.conf.getOption(key).contains(dir)) {
      names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(key, dir)
    }
  }
}

/** Deterministic-aggregation helpers.
  *
  * Double summation is order-dependent, and Spark (partial/final partition
  * aggregation) visits rows in a different order than a single-node oracle.
  * The testdata money columns carry <= 2 fractional digits, so casting to
  * decimal makes the aggregation exact and order-independent; casting the
  * exact decimal result back to double is then bit-identical across engines.
  */
object Num {
  def dec(c: Column, p: Int = 18, s: Int = 2): Column = c.cast(DecimalType(p, s))

  /** Exact sum of a <=2-decimal-digit double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent average: exact decimal sum / count, in doubles. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)
}
