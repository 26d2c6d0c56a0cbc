package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.Num.dec

/** Structured Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly request/response — no streaming surface exists
  * in it (SURVEY.md §2.B "Streaming: none") — so this module is the
  * beyond-reference extension: the same engine operators expressed as
  * incremental plans. Each operator is watermark-bounded so state is
  * droppable and the plan runs indefinitely on an unbounded source; at
  * cluster scale the state store shards by the grouping key.
  */
object EventStreams {

  /** Read schema with ts's type left open: the fixture layout varies
    * across generations — TIMESTAMP(NANOS) (readable in Spark 4 only via
    * the nanos-as-long legacy mode) or naive TIMESTAMP(MICROS) (inferred
    * TIMESTAMP_NTZ). readEvents fills in the actual footer type and
    * normalizes to a session-UTC micros timestamp either way, the same
    * truncation DuckDB applies.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files. A
    * streaming reader needs an explicit schema, so the ts layout is probed
    * with one batch footer read of the same directory first.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val base = spark.readStream.schema(schema).parquet(dir)
    tsType match {
      case LongType => base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => base.withColumn("ts", col("ts").cast(TimestampType))
      case _ => base
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state retention. Partial aggregation applies per micro-batch; the
    * shuffle key is (window, event_type).
    */
  def windowedCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization via the built-in session_window — sessions
    * close when a user is idle longer than `gap`.
    */
  def sessionWindows(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("total"))

  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)
  final case class UserState(n: Long, total: Double)

  /** Custom stateful aggregation via mapGroupsWithState: a running
    * per-user event count + value sum, emitted each micro-batch (Update
    * mode). The state object is the minimal commutative summary, so the
    * state store holds O(users), not O(events).
    */
  def statefulUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update(UserState(n, total))
          UserAgg(userId, n, total)
      }
  }

  /** Streaming exact deduplication: first occurrence per key wins, with
    * the watermark bounding how long a key is remembered — the streaming
    * face of `Dedup.exactKeep`. State is O(distinct keys inside the
    * watermark window), sharded by key, so an unbounded stream cannot
    * grow state without bound (plain dropDuplicates on a stream would).
    */
  def dedupByKey(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join the event stream against a static
    * dimension (stateless — each micro-batch joins independently, and a
    * small dimension broadcasts exactly as in the batch plan).
    */
  def enrichWithStatic(
      events: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    // Dataset-qualified keys: bare col() would be AMBIGUOUS_REFERENCE
    // whenever both sides name the key identically.
    events.join(dim, events(streamKey) === dim(dimKey), "left")

  /** STREAM-STREAM attribution join: every event within one hour after a
    * purchase by the same user (the streaming face of the batch bucketed
    * range join, queries p34). Both sides carry watermarks and the join
    * condition bounds event time relative to purchase time, so the state
    * store retains each side only for `watermarkDelay` + the window —
    * Spark evicts older state, and the join runs indefinitely on
    * unbounded streams. State shards by user_id at cluster scale.
    */
  def attributionJoin(
      events: DataFrame,
      purchases: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val clicks = events
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    val p = purchases
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    clicks.join(p,
      col("user_id") === col("p_user") &&
        col("ts") >= col("p_ts") &&
        col("ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("purchase_id"))
  }

  /** Exactly-once streaming sink into an Iceberg-lite table: each
    * micro-batch commits as one snapshot tagged with its batch id
    * (foreachBatch is at-least-once — a restarted query re-offers the
    * last batch, and the tag makes the duplicate commit a no-op, see
    * IcebergLiteWriter.appendStreamingBatch). Readers see atomic
    * snapshot-level progress and can follow the stream incrementally via
    * IcebergLite.incrementalScan — the batch/streaming handoff at scale.
    * Pass the returned query to `awaitTermination`/`processAllAvailable`.
    * Long-running streams should pair with periodic
    * IcebergLiteWriter.expireSnapshots maintenance so the snapshot log
    * stays bounded, exactly as real Iceberg streaming tables do.
    */
  def writeToIcebergLite(
      df: DataFrame,
      tableDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.IcebergLiteWriter.appendStreamingBatch(
          batch.sparkSession, batch.toDF(), tableDir, batchId)
        ()
      }
      .start()

  /** Run a streaming frame to completion against a memory sink and return
    * the collected result table (test/demo harness for finite sources).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(name)
  }
}
