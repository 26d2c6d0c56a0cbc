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
}
