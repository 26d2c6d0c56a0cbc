package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global quantile cutoffs and outlier filtering — the two-pass
  * shape of corpus length filtering ("drop the shortest 5% and longest
  * 5%"): pass 1 derives the cutoff values, pass 2 is a map-only filter.
  *
  * The cutoff is the RANK-based quantile — the smallest value whose
  * running count reaches ceil(p * n) — not an interpolated one:
  * interpolation formulas differ in floating-point shape across engines
  * (a*(1-f)+b*f vs a+(b-a)*f), while rank arithmetic is integer-exact
  * everywhere, so the cutoffs (and therefore the filtered set) are
  * engine-reproducible bit-for-bit.
  *
  * Scale shape: the quantile pass aggregates to DISTINCT VALUE counts
  * first (hash aggregate, map-side combined), so the running-count window
  * ranges over value cardinality, not row count — for document lengths
  * that is bounded by the max length, millions at most, independent of
  * corpus row count. The data pass never shuffles. The sketch alternative
  * (`approx_percentile`) trades exactness for a mergeable fixed-size
  * state; prefer it when cutoffs feed heuristics rather than contracts.
  */
object Quantiles {

  /** One row (lo, hi): rank-quantile cutoffs at pLow/pHigh over `c`. */
  def rankCutoffs(df: DataFrame, c: Column, pLow: Double, pHigh: Double): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow <= pHigh, "need 0 <= pLow <= pHigh <= 1")
    val byValue = df.groupBy(c.as("v")).agg(count(lit(1)).as("cnt"))
    // Running count over distinct values — cardinality-bounded, not
    // corpus-bounded (see scaladoc).
    val cum = byValue
      .withColumn("cle", sum(col("cnt")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(byValue.agg(sum(col("cnt")).as("n"))))
    val lo = cum.filter(col("cle") >= ceil(lit(pLow) * col("n")).cast("long"))
      .agg(min(col("v")).as("lo"))
    val hi = cum.filter(col("cle") >= ceil(lit(pHigh) * col("n")).cast("long"))
      .agg(min(col("v")).as("hi"))
    lo.crossJoin(hi)
  }

  /** Per-GROUP exact rank quantiles — the percentile block of a per-source
    * data card ("median and p95 document length by source"): for every
    * group, the smallest value whose group-local running count reaches
    * ceil(p * n_group), for each requested p. Same integer-exact rank rule
    * as [[rankCutoffs]], so every engine derives identical percentiles.
    *
    * Scale shape: one (group, value) hash aggregate (map-side combined),
    * then a window over DISTINCT VALUES within each group — cardinality-
    * bounded, not row-bounded — a group-keyed totals join, and one final
    * aggregate with a conditional MIN per requested quantile. No
    * corpus-sized window anywhere.
    *
    * Returns (group named as `groupName`, n_rows, q<pp> per quantile),
    * quantile columns labeled by percent (q25, q50, ...).
    */
  def groupedRankQuantiles(df: DataFrame, group: Column, groupName: String,
      c: Column, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "quantiles must lie in (0, 1]")
    val byValue = df.groupBy(group.as("g"), c.as("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byValue.withColumn("cle", sum(col("cnt")).over(w))
    val tot = byValue.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
    val qCols = ps.map { p =>
      val label = "q" + math.round(p * 100)
      min(when(col("cle") >= ceil(lit(p) * col("n")).cast("long"), col("v")))
        .cast("long").as(label)
    }
    cum.join(tot, "g")
      .groupBy(col("g").as(groupName), col("n").cast("long").as("n_rows"))
      .agg(qCols.head, qCols.tail: _*)
  }

  /** Per-dimension robust location/scale over an embedding column —
    * median and MAD (median absolute deviation), the outlier-insensitive
    * statistics a robust-scaling / winsorizing pass normalizes embedding
    * dimensions with before clustering or quantization. Both medians use
    * the same integer-exact RANK rule as [[groupedRankQuantiles]]
    * (smallest value whose per-dimension running count reaches
    * ceil(n/2)) applied to the raw DOUBLE values, so any engine derives
    * bit-identical statistics — no interpolation, no float averaging.
    *
    * Scale shape: the corpus is exploded and aggregated to
    * (pos, value, cnt) ONCE; the deviation pass derives
    * (pos, |value - med|, cnt) from that CARDINALITY-SIZED relation (the
    * d-row median table broadcast onto it) rather than re-exploding the
    * corpus, then re-aggregates — so everything after the single corpus
    * pass is bounded by distinct-value cardinality, and both medians'
    * windows range over distinct values within each of the d dimensions.
    * `dims` bounds the dimensions considered (pos < dims), so op and
    * oracle agree on the dimension count by construction even if some
    * vectors are longer. Returns (pos, med, mad).
    */
  def robustDimStats(emb: DataFrame, dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    // posexplode the RAW float array and aggregate on the FLOAT key: the
    // former transform(embedding, x -> CAST AS DOUBLE) was a higher-order
    // lambda — interpreted, allocating a fresh 64-element array per row,
    // and breaking GenerateExec out of whole-stage codegen. Casting the
    // CARDINALITY-BOUNDED distinct values after the aggregate is the
    // identical relation (float→double is injective and order-preserving)
    // at a fraction of the per-row cost.
    val byValue = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "xf")))
      .filter(col("pos") < dims)
      .groupBy(col("pos"), col("xf")).agg(count(lit(1)).as("cnt"))
      .select(col("pos"), col("xf").cast("double").as("v"), col("cnt"))
    // One WindowExec computes BOTH the running count and the per-dimension
    // total (same partitioning + ordering, different frames), so each
    // median references its input exactly once — no join branch, no
    // second scan of the counts relation. Beyond the execution saving,
    // this keeps the WHOLE plan tree small: the former two-branch form,
    // referenced again by the deviation pass, compounded into a tree
    // Catalyst took multiple seconds to re-plan per run (planning, not
    // execution, was ~90% of the query's wall at the 10x fixture).
    def rankMedian(counts: DataFrame, out: String): DataFrame = {
      val cumW = Window.partitionBy(col("pos")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("pos")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts
        .select(col("pos"), col("v"),
          sum(col("cnt")).over(cumW).as("cle"),
          sum(col("cnt")).over(totW).as("n"))
        .groupBy(col("pos"))
        .agg(min(when(col("cle") >= ceil(lit(0.5) * col("n")).cast("long"), col("v")))
          .as(out))
    }
    val med = rankMedian(byValue, "med")
    val devCounts = byValue.join(broadcast(med), "pos")
      .groupBy(col("pos"), abs(col("v") - col("med")).as("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = rankMedian(devCounts, "mad")
    med.join(mad, "pos").select(col("pos"), col("med"), col("mad"))
  }

  /** Rows of `df` whose `c` lies inside the [pLow, pHigh] rank-quantile
    * band — e.g. length-outlier removal for a training corpus.
    */
  def outlierFilter(df: DataFrame, c: Column, pLow: Double, pHigh: Double): DataFrame =
    df.crossJoin(broadcast(rankCutoffs(df, c, pLow, pHigh)))
      .filter(c >= col("lo") && c <= col("hi"))
      .drop("lo", "hi")
}
