package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Globally-ordered rankings without a single-reducer sort.
  *
  * `NTILE(n) OVER (ORDER BY ...)` (no PARTITION BY) makes Spark move every
  * row to one partition ("WindowExec: No Partition Defined") — a wall at
  * corpus scale. The scale-safe shape: range-repartition on the order key
  * (each partition holds a contiguous key range), rank locally per
  * partition, then add per-partition offsets computed from the tiny
  * partition-count relation. The global rank is exact for any total order
  * (give LIMIT-style tiebreakers), independent of where the range sampler
  * places partition boundaries.
  *
  * Cache lifecycle: each op persists its ranged relation (required for
  * bounds consistency — see withGlobalRank) and the persist must outlive
  * the returned DataFrame's actions; long-lived sessions should
  * `spark.catalog.clearCache()` between unrelated workloads.
  */
object GlobalRank {

  /** Exact global row number (1-based) under `order`, as column `out`.
    * One range shuffle + one partition-local sort; the offset side is one
    * row per partition, broadcast back.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String = "rn"): DataFrame =
    withGlobalRank(df, order).withColumnRenamed("__rn", out).drop("__tot")

  /** Exact NTILE(buckets) under `order` — same bucket boundaries as the
    * single-reducer window form: the first `total % buckets` buckets take
    * `ceil(total / buckets)` rows, the rest `floor(total / buckets)`.
    */
  def ntile(df: DataFrame, buckets: Int, order: Seq[Column], out: String = "ntile"): DataFrame = {
    require(buckets > 0, "ntile needs at least one bucket")
    withGlobalRank(df, order)
      .withColumn(out, ntileBucket(buckets))
      .drop("__rn", "__tot")
  }

  /** Bucket index from the global row number `__rn` and total `__tot` —
    * ALL integral arithmetic (`div`, ADVICE r16: the earlier Column `/`
    * was double division, so "exact past 2^53" only held for `big`
    * itself). Boundaries match the single-reducer NTILE: the first
    * `__tot % buckets` buckets take `__tot div buckets + 1` rows, the
    * rest one fewer. The ELSE branch divides by `__tot div buckets`,
    * which is 0 only when `__tot < buckets` — and then the WHEN arm
    * covers every row (`__rn <= __tot * 1`), so the zero divisor is
    * never evaluated (CASE short-circuits per row).
    */
  private def ntileBucket(buckets: Int): Column = {
    val big = s"((__tot div $buckets) + 1)" // ceil bucket size
    val r = s"(__tot % $buckets)"           // # buckets of that size
    expr(s"""CASE WHEN __rn <= $r * $big
      THEN (__rn - 1) div $big + 1
      ELSE $r + (__rn - $r * $big - 1) div (__tot div $buckets) + 1
      END""").cast("int")
  }

  /** Exact NTILE(buckets) under the total order (value, tie) — identical
    * boundaries to [[ntile]] / the single-reducer window — WITHOUT range-
    * repartitioning the data relation. [[ntile]]'s shape costs the range
    * sampler (a full extra computation of the input lineage), a corpus-
    * sized range exchange, and a corpus-sized persist; for an input whose
    * lineage is itself expensive (a scored corpus behind joins and
    * aggregates) those three dominate the query (the r11 p90 floor).
    *
    * Here the global rank is decomposed as
    *   rn = (# rows with smaller `value`)  +  (local rank of `tie` within
    *        this row's `value` group)
    * — the first term from a VALUE-COUNT relation (map-side-combined
    * aggregate, cardinality-bounded) prefix-summed by [[prefixSum]], the
    * second from a value-PARTITIONED window (hash exchange, per-group
    * local sort — no single reducer, no range sampler). The data relation
    * crosses the wire exactly once (hash on `value`), and the value-keyed
    * join immediately after the window reuses that partitioning, so only
    * the narrow count relation moves to meet it.
    *
    * Caveat: per-group state is one sort run over each `value` tie group
    * — safe unless one single value dominates the corpus (a degenerate
    * scoring); [[ntile]] remains the choice for such distributions.
    * `tie` must complete a total order for cross-engine-exact ranks.
    *
    * `boundedValues = true` is the caller's assertion that the DISTINCT
    * value count stays small at any corpus size (a concentrated integer
    * rate, a grade, a bucket id): the cross-value prefix then runs as one
    * unpartitioned window over the value-count relation and broadcasts
    * it, cutting the prefix machinery from ~6 stages to 2. Identical
    * output either way; the flag only trades generality for stages.
    * If the assertion is VIOLATED at scale, correctness still holds —
    * the window runs over value COUNTS, never data rows — but the
    * count relation grows with the distinct-value count, and its
    * single-partition window sort plus the broadcast of the prefix
    * become the bottleneck; a caller seeing that should drop the flag.
    */
  def ntileByValue(df: DataFrame, buckets: Int, value: Column, tie: Column,
      out: String = "ntile", boundedValues: Boolean = false): DataFrame = {
    require(buckets > 0, "ntile needs at least one bucket")
    val counts = df.groupBy(value.as("__nbv_v")).agg(count(lit(1)).as("__nbv_cnt"))
    if (boundedValues) {
      // Caller-asserted CARDINALITY-BOUNDED value space (e.g. p90's
      // integerized perplexity rate: 666 distinct values at sf0.1 →
      // 770 at 10× — the rate concentrates, so the count relation grows
      // ~log with the corpus). Under that contract the cross-value
      // prefix rides ONE unpartitioned window over the value-count
      // relation — cum offset and grand total from the same
      // exchange+sort — and the data side BROADCAST-joins the narrow
      // result, with the total carried on its rows. Versus the general
      // prefixSum path this removes the range sampler job, the range
      // exchange, the ranged persist, the per-partition offsets pass,
      // and the separate 1-row total broadcast — the r14 verdict's
      // job-cascade item (p90: 31 jobs for 1.3 s of exec). Ranks and
      // boundaries are bit-identical to the general path.
      val ow = Window.orderBy(col("__nbv_v"))
      val pref = counts
        .withColumn("__nbv_off", coalesce(sum(col("__nbv_cnt"))
          .over(ow.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__tot", sum(col("__nbv_cnt"))
          .over(ow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("__nbv_v"), col("__nbv_off"), col("__tot"))
      val lw = Window.partitionBy(value).orderBy(tie)
      return df.withColumn("__nbv_lrn", row_number().over(lw).cast("long"))
        .join(broadcast(pref), value <=> col("__nbv_v"))
        .withColumn("__rn", col("__nbv_off") + col("__nbv_lrn"))
        .withColumn(out, ntileBucket(buckets))
        .drop("__nbv_v", "__nbv_off", "__nbv_lrn", "__rn", "__tot")
    }
    // prefixSum persists its ranged copy of the narrow count relation, so
    // the total below re-reads that persist, not the corpus aggregate.
    val pref = prefixSum(counts, Seq(col("__nbv_v")), col("__nbv_cnt"), "__nbv_cum")
      .select(col("__nbv_v"), col("__nbv_cnt"),
        (col("__nbv_cum") - col("__nbv_cnt")).as("__nbv_off"))
    val totDf = pref.agg(max(col("__nbv_off") + col("__nbv_cnt")).as("__tot"))
    val lw = Window.partitionBy(value).orderBy(tie)
    // Null-safe equality: a NULL value forms its own count group (Spark
    // sorts nulls first, matching [[ntile]]'s range partitioning), and a
    // plain === would silently drop those rows while still counting them
    // in the total.
    df.withColumn("__nbv_lrn", row_number().over(lw).cast("long"))
      .join(pref.select(col("__nbv_v"), col("__nbv_off")).hint("shuffle_hash"),
        value <=> col("__nbv_v"))
      .withColumn("__rn", col("__nbv_off") + col("__nbv_lrn"))
      .crossJoin(broadcast(totDf))
      .withColumn(out, ntileBucket(buckets))
      .drop("__nbv_v", "__nbv_off", "__nbv_lrn", "__rn", "__tot")
  }

  /** Exact global running sum of `value` under `order` (inclusive of the
    * current row), as column `out` — the distributed form of
    * `SUM(value) OVER (ORDER BY ...)`, which Spark would otherwise
    * execute on a single partition. Same partition-offset construction
    * as the ranks: per-partition sums (one tiny row each) become
    * exclusive offsets, added to a partition-local running sum. `value`
    * must be exact-typed (integral/decimal) for cross-engine
    * reproducibility — wrap doubles in graft.Num.dec first.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String = "cumsum"): DataFrame = {
    // Persisted for the same reason as withGlobalRank: both branches must
    // see ONE range partitioning.
    val ranged = CacheScope.persistTracked(df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id()))
    val ow = Window.orderBy(col("__pid"))
    val offsets = ranged.groupBy(col("__pid")).agg(sum(value).as("__psum"))
      .select(col("__pid"),
        (sum(col("__psum")).over(ow) - col("__psum")).as("__off"))
    val lw = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__lcum", sum(value).over(lw))
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__lcum"))
      .drop("__pid", "__lcum", "__off")
  }

  private def withGlobalRank(df: DataFrame, order: Seq[Column]): DataFrame = {
    // Sort within the range partitions, then derive BOTH the partition id
    // and the local 1-based index from monotonically_increasing_id
    // (partition index << 33 | row index) — rank assignment costs no
    // second full-data exchange, unlike a window PARTITION BY would.
    // The id is deterministic here because the partition-local sort is on
    // a caller-supplied total order.
    // The persist is CORRECTNESS, not tuning: the offsets branch and the
    // data branch would otherwise each plan their own range Exchange, and
    // RangePartitioner samples bounds with a plan-instance-dependent seed
    // — two instances can place boundaries differently once the sample no
    // longer covers every row, making the counts describe a partitioning
    // the data rows don't have. One materialization pins one partitioning
    // for both consumers (the cost is the same disk footprint the two
    // jobs' shared shuffle files would have under RDD zipWithIndex).
    val ranged = CacheScope.persistTracked(df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mono"), 33))
      .withColumn("__lrn", (col("__mono") % (1L << 33)) + 1L)
      .drop("__mono"))
    // One row per partition: local count -> exclusive prefix offset and the
    // global total. The window here runs over partition-count rows (tens),
    // not data rows — that is the whole point. (The second pass over the
    // source is the standard two-phase global-index shape, same as RDD
    // zipWithIndex; only per-partition COUNTS shuffle.)
    val ow = Window.orderBy(col("__pid"))
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .select(
        col("__pid"),
        (sum(col("__cnt")).over(ow) - col("__cnt")).as("__off"),
        sum(col("__cnt")).over(
          ow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("__tot"))
    ranged
      .join(broadcast(offsets), "__pid")
      .withColumn("__rn", col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
