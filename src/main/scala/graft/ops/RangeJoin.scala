package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the missing-from-Spark range join,
  * composed from existing operators: a raw `p.key = r.key AND p.t >=
  * r.start AND p.t < r.end` theta join degenerates to a per-key nested
  * loop (BroadcastNestedLoop without the equi-key); bucketing time into
  * `granularity`-second cells turns it into a plain hash-partitioned
  * equi-join on (key, bucket) plus a row-local exact filter. Each range
  * explodes to its covered buckets — pick the granularity near the
  * typical range length so the fan-out stays O(1) per range.
  *
  * A (point, range) pair can only meet in the point's single bucket, so
  * the join produces no duplicates and needs no distinct.
  */
object RangeJoin {

  def pointInRange(
      points: DataFrame, ranges: DataFrame,
      pointKey: String, rangeKey: String,
      pointTime: String, rangeStart: String, rangeEnd: String,
      granularitySec: Long = 86400L): DataFrame = {
    // Bucket at MICROSECOND resolution (the timestamps' native precision):
    // truncated-seconds arithmetic would mis-bucket the final fractional
    // second of a range — a point in [end's-truncated-second, end) lands
    // one bucket past floor((secs(end)-1)/g) and would be silently
    // dropped. The exclusive upper bucket is the bucket of the last
    // included microsecond, end-1us. The timestamp_ltz cast also accepts
    // NTZ/DATE/epoch-long inputs.
    val granMicros = granularitySec * 1000000L
    def micros(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast("timestamp_ltz"))
    val pb = points.withColumn("__b",
      floor(micros(col(pointTime)) / granMicros))
    // Empty/inverted ranges (end <= start) must produce ZERO buckets —
    // sequence(a, b) with a > b counts DOWN in Spark, so a malformed row
    // would otherwise explode into a huge descending bucket array. The
    // unmatched `when` yields NULL, which explode drops.
    val rb = ranges.withColumn("__b", explode(
      when(col(rangeEnd) > col(rangeStart), sequence(
        floor(micros(col(rangeStart)) / granMicros),
        floor((micros(col(rangeEnd)) - 1) / granMicros)))))
    pb.join(rb,
        pb(pointKey) === rb(rangeKey) && pb("__b") === rb("__b") &&
          pb(pointTime) >= rb(rangeStart) && pb(pointTime) < rb(rangeEnd))
      .drop("__b")
  }
}
