package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Num.dec

/** Skew-mitigation building blocks. AQE's runtime skew-join handling
  * covers sort-merge joins; these are the PLANNED forms for when the hot
  * keys are known or the operator is an aggregation (which AQE's skew
  * logic does not split): spread a hot key over `factor` reducers with a
  * deterministic salt, then combine.
  *
  * The salt is md5-derived from a per-row unique column rather than
  * rand() — same spread, but reproducible: results are oracle-checkable
  * and retries/speculative tasks cannot produce different placements.
  */
object Skew {

  /** Deterministic salt in [0, factor). */
  def salt(unique: Column, factor: Int): Column =
    pmod(conv(substring(md5(unique.cast("string")), 1, 4), 16, 10).cast("int"),
      lit(factor))

  /** Two-stage salted COUNT + exact SUM per key: partials on (key, salt)
    * — no reducer sees more than ~1/factor of a hot key's rows — then a
    * tiny combine keyed on the key alone. Decimal partials keep the
    * double sum order-independent (see graft.Num).
    */
  def saltedCountSum(
      df: DataFrame, key: Column, unique: Column, value: Column,
      factor: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(unique, factor).as("__salt"))
      .agg(count(lit(1)).as("pn"), sum(dec(value)).as("pv"))
      .groupBy(col("key"))
      .agg(
        sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("total"))

  /** Salted fact-to-dim equi-join for a skewed fact key: facts carry a
    * deterministic salt, the (small) dim side is replicated `factor`
    * ways, and the join key becomes (key, salt) — a hot key's rows land
    * on `factor` different reducers instead of one.
    */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, unique: Column,
      factor: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", salt(unique, factor))
    val repDim = dim.withColumn("__salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    saltedFacts
      .join(repDim,
        saltedFacts(factKey) === repDim(dimKey) &&
          saltedFacts("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
