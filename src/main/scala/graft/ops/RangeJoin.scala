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
    // Epoch seconds via timestamp_ltz: NTZ timestamps refuse a direct
    // long cast, and this route also accepts DATE and epoch-long inputs.
    def secs(c: org.apache.spark.sql.Column) =
      c.cast("timestamp_ltz").cast("long")
    val pb = points.withColumn("__b",
      floor(secs(col(pointTime)) / granularitySec))
    val rb = ranges.withColumn("__b", explode(sequence(
      floor(secs(col(rangeStart)) / granularitySec),
      floor((secs(col(rangeEnd)) - 1) / granularitySec))))
    pb.join(rb,
        pb(pointKey) === rb(rangeKey) && pb("__b") === rb("__b") &&
          pb(pointTime) >= rb(rangeStart) && pb(pointTime) < rb(rangeEnd))
      .drop("__b")
  }
}
