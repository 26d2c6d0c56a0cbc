package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and cohort retention — the
  * classic product-analytics cuts over an events stream, shaped for
  * distributed execution (per-user aggregates, never per-user sorts of
  * the raw event log on one node).
  *
  * Reference surface: the events table (`event_id, ts, user_id,
  * event_type, value, props`) that the sessionization (p19) and as-of
  * (p20) operators already run on.
  */
object Funnels {

  /** Ordered funnel conversion counts: `n_<step>` = users whose first
    * occurrence of each step comes strictly AFTER their first qualifying
    * occurrence of the previous step (first view -> first click after
    * that view -> first purchase after that click …). One row out.
    *
    * Scale shape: one filtered per-user MIN aggregate per step (map-side
    * combinable, hash-partitioned on user_id), chained by equi-joins on
    * user_id; the final stage counts are 1-row relations cross-joined
    * together. Nothing ever sorts or windows the raw event log; per-step
    * state is one row per surviving user.
    */
  def funnelCounts(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val stages = steps.tail.scanLeft(
      events.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    stages.zip(steps).map { case (df, step) =>
      df.agg(count(lit(1)).as(s"n_$step"))
    }.reduce(_.crossJoin(_))
  }

  /** Cohort retention matrix: users cohorted by the week of their first
    * `signupType` event, counted distinct per (cohort week, activity
    * week) for activity AT or AFTER the cohort week — the
    * product-analytics retention triangle (pre-signup activity is not
    * "retention" and would put cells above the diagonal).
    *
    * Scale shape: the cohort relation is one row per signed-up user
    * (user-dimension-sized); the activity side is a map-only projection
    * of the event log joined on user_id — hash-partitioned, linear —
    * and the final COUNT(DISTINCT) aggregates on the small
    * (cohort, activity) week grid.
    */
  def cohortRetention(events: DataFrame, signupType: String = "signup"): DataFrame = {
    val cohort = events.filter(col("event_type") === signupType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort_week"))
    events.select(col("user_id"), date_trunc("week", col("ts")).as("activity_week"))
      .join(cohort, "user_id")
      .filter(col("activity_week") >= col("cohort_week"))
      .groupBy(col("cohort_week"), col("activity_week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Volume-anomaly (spike/drop) detection over daily event counts: a
    * (event_type, day) is flagged when its count deviates from the
    * type's mean daily count by at least two standard deviations — the
    * classic z-score monitor, made engine-exact by clearing every
    * denominator: |c - S/n| >= 2*sqrt(SS/n - (S/n)²) is multiplied
    * through by n² into (n·c - S)² >= 4·(n·SS - S²), ALL integer
    * arithmetic on counts (widened to decimal so a petabyte-scale count
    * can't wrap a square; DuckDB reaches the same values through its
    * HUGEINT promotion). No sqrt, no division, no float — the flag is
    * bit-identical in any engine.
    *
    * The day key is a TIMESTAMP (date_trunc), not a DATE: parquet date32
    * decodes as generic objects in arrow/pandas consumers while DuckDB
    * dates decode as datetimes, so a DATE key trips dtype-strict result
    * comparators even when the values agree (same pattern as the
    * retention triangle's week columns).
    *
    * Scale shape: one (type, day) count aggregate, one per-type stats
    * aggregate over the DAILY relation (days × types rows, not events),
    * and a broadcast-sized join back — the raw event log is scanned
    * exactly once.
    */
  def eventSpikes(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val dec = "decimal(38,0)"
    // Each FACTOR widens BEFORE its multiply (the tf-idf lesson): a
    // billion-events day squared wraps int64 inside the sum, and casting
    // the wrapped product would be too late.
    val ne = col("n_events").cast(dec)
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_days"),
      sum(ne).as("s"),
      sum(ne * ne).as("ss"))
    daily.join(stats, "event_type")
      .withColumn("lhs", {
        val d = (col("n_days").cast(dec) * col("n_events").cast(dec)) -
          col("s").cast(dec)
        d * d
      })
      .withColumn("rhs",
        (lit(4).cast(dec) * (col("n_days").cast(dec) * col("ss").cast(dec)
          - col("s").cast(dec) * col("s").cast(dec))))
      .select(col("event_type"), col("day"),
        col("n_events").cast("long").as("n_events"),
        (col("lhs") >= col("rhs")).as("is_spike"))
  }

  /** Per-user behavior-trajectory assembly — the sequence-dataset prep an
    * agent/behavior-model pipeline runs over an event log: each user's
    * events collapsed to one example row with a fingerprint of the first
    * `cap` event types in (ts, event_id) order (the dedup/split key for
    * sequence datasets). Ordering is total (event_id breaks ts ties), so
    * the fingerprint is engine-reproducible; `truncated` marks users
    * whose fingerprint covers only the cap prefix, so capped fingerprints
    * are distinguishable from full ones.
    *
    * Scale shape: one hash aggregate keyed on user, with BOUNDED
    * per-group state — n_events/first_ts/last_ts are plain
    * count/min/max, and the hashed prefix comes from the cap-bounded
    * [[graft.functions.FirstKBySeq]] accumulator (≤ 2·cap entries per
    * buffer), not a collect_list of the full sequence: a bot account
    * with 10^8 events is a single-group executor OOM under the collect
    * form, and a constant-state row here. No window, no corpus-wide
    * sort.
    */
  def trajectories(events: DataFrame, cap: Int = 100000): DataFrame = {
    require(cap > 0, "cap must be positive")
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        graft.functions.FirstKBySeq.firstK(cap)(
          unix_micros(col("ts")), col("event_id"), col("event_type")).as("head_types"))
      .select(col("user_id"),
        col("n_events").cast("long").as("n_events"),
        col("first_ts"), col("last_ts"),
        md5(concat_ws("|", col("head_types"))).as("traj_md5"),
        (col("n_events") > cap).as("truncated"))
  }
}
