package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus data-card report — the per-source summary table a dataset
  * release publishes (doc counts, exact-duplicate rate, token/char
  * volume, dominant language): the last step of a curation pipeline and
  * the first thing its consumers read.
  *
  * Determinism: every column is an integer aggregate or a deterministic
  * argmax (dominant language = highest doc count, ties to the
  * lexicographically smallest code, via one min_by over (-count, lang)).
  * Ratios are deliberately NOT emitted — a division's rounding is the
  * only thing that could diverge across engines, and the consumer can
  * divide the exact totals themselves.
  *
  * Scale shape: two hash aggregates keyed by source (one with the
  * per-language sub-key), both map-side combinable, joined on the
  * handful of source rows — a 100 TB corpus reports in two scans with no
  * wide state anywhere.
  */
object Report {

  /** (source, n_docs, n_distinct_texts, n_ws_tokens, n_chars, top_lang):
    * exact-dup rate = 1 - n_distinct_texts/n_docs, left to the reader.
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    val totals = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"),
      sum(size(split(col("text"), " "))).cast("long").as("n_ws_tokens"),
      sum(length(col("text"))).cast("long").as("n_chars"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("ln"))
      .groupBy(col("source"))
      .agg(min_by(col("lang"), struct((-col("ln")).as("neg"), col("lang"))).as("top_lang"))
    totals.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        col("n_ws_tokens"), col("n_chars"), col("top_lang"))
  }
}
