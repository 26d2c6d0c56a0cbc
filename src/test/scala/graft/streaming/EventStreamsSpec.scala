package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{Num, SparkFixture, Tables}

/** Streaming results must equal their batch equivalents on a finite
  * source — the incremental plan is an implementation detail, not a
  * semantics change.
  */
class EventStreamsSpec extends AnyFunSuite with SparkFixture {

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(
      Paths.get(sf0001, "events.parquet"),
      dir.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private lazy val batchEvents = Tables.t(spark, sf0001, "events")

  test("windowed counts match the batch computation") {
    val streamed = EventStreams.runToMemory(
      EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir)),
      "win_counts", OutputMode.Complete())
    val batch = batchEvents
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Num.dec(col("value"))).cast("double").as("total"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows match the batch session_window computation") {
    val streamed = EventStreams.runToMemory(
      EventStreams.sessionWindows(EventStreams.readEvents(spark, eventsDir), gap = "10 minutes"),
      "sess_win", OutputMode.Complete())
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(Num.dec(col("value"))).cast("double").as("total"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("total"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful per-user totals converge to the batch totals") {
    val streamed = EventStreams.runToMemory(
      EventStreams.statefulUserTotals(
        spark, EventStreams.readEvents(spark, eventsDir)).toDF(),
      "user_totals", OutputMode.Update())
    // Update mode emits one row per user per batch; the final emission per
    // user must equal the batch aggregate.
    val finalPerUser = streamed
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
    val batch = batchEvents.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    assert(finalPerUser.exceptAll(batch).isEmpty && batch.exceptAll(finalPerUser).isEmpty)
  }

  test("watermark bounds state: late-arriving aggregation plan is streaming") {
    val df = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
    assert(df.isStreaming)
  }

  test("streaming dedup keeps one row per key, matching batch dropDuplicates") {
    val streamed = EventStreams.runToMemory(
      EventStreams.dedupByKey(
        EventStreams.readEvents(spark, eventsDir), Seq("user_id")),
      "dedup_stream", OutputMode.Append())
    // One survivor per user, and the surviving key set is the batch's.
    val perKey = streamed.groupBy("user_id").count().collect()
    assert(perKey.forall(_.getLong(1) == 1))
    val streamKeys = perKey.map(_.getLong(0)).toSet
    val batchKeys = batchEvents.select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(streamKeys == batchKeys)
  }

  test("stream-static enrichment equals the batch join") {
    val dim = Tables.t(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val streamed = EventStreams.runToMemory(
      EventStreams.enrichWithStatic(
        EventStreams.readEvents(spark, eventsDir), dim, "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("c_nationkey")),
      "enrich_stream", OutputMode.Append())
    val batch = batchEvents
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("c_nationkey"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream attribution join matches the batch range join") {
    val streamed = EventStreams.runToMemory(
      EventStreams.attributionJoin(
        EventStreams.readEvents(spark, eventsDir),
        EventStreams.readEvents(spark, eventsDir)),
      "attr_join", OutputMode.Append())
    val batch = batchEvents.select(col("event_id"), col("user_id"), col("ts"))
      .join(
        batchEvents.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts")),
        col("user_id") === col("p_user") &&
          col("ts") >= col("p_ts") &&
          col("ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("purchase_id"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming sink into Iceberg-lite is exactly-once under batch replay") {
    import graft.sources.{IcebergLite, IcebergLiteWriter}
    val tableDir = Files.createTempDirectory("stream_sink").toString + "/warehouse/events_sink"
    val ckpt = Files.createTempDirectory("stream_sink_ckpt").toString

    // Drive the finite stream into the table.
    val q = EventStreams.writeToIcebergLite(
      EventStreams.readEvents(spark, eventsDir)
        .select(col("event_id"), col("user_id"), col("value")),
      tableDir, ckpt)
    try q.processAllAvailable() finally q.stop()

    val expected = batchEvents.count()
    assert(IcebergLite.scan(spark, tableDir).count() == expected)
    val committed = IcebergLiteWriter.committedStreamingBatchIds(spark, tableDir)
    assert(committed.nonEmpty)

    // At-least-once replay: re-offering an already-committed batch id is a
    // no-op (returns false, table unchanged) — this is what makes the
    // table exactly-once when a restarted query replays its last batch.
    val replayed = IcebergLiteWriter.appendStreamingBatch(
      spark, batchEvents.select(col("event_id"), col("user_id"), col("value")),
      tableDir, committed.max)
    assert(!replayed)
    assert(IcebergLite.scan(spark, tableDir).count() == expected)

    // A genuinely new batch id commits and is tagged in the snapshot log.
    val fresh = IcebergLiteWriter.appendStreamingBatch(
      spark, batchEvents.select(col("event_id"), col("user_id"), col("value")).limit(7),
      tableDir, committed.max + 1)
    assert(fresh)
    assert(IcebergLite.scan(spark, tableDir).count() == expected + 7)
    assert(IcebergLiteWriter.committedStreamingBatchIds(spark, tableDir)
      .contains(committed.max + 1))

    // The increment since the stream's last snapshot is exactly the fresh
    // batch — the streaming/batch handoff readers rely on.
    val snaps = IcebergLite.snapshotsRelation(spark, tableDir)
      .orderBy(col("committed_at"))
      .select("snapshot_id").collect().map(_.getLong(0))
    val inc = IcebergLite.incrementalScan(spark, tableDir, snaps(snaps.length - 2))
    assert(inc.count() == 7)
  }
}
