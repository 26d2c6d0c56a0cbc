package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, fingerprinting. All row-local
  * (map-only, no shuffle) — they run at scan speed over any corpus size
  * and stay inside whole-stage codegen.
  */
object TextOps {

  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to")
  val StopFr: Seq[String] = Seq("le", "la", "les", "de", "et")
  val StopEs: Seq[String] = Seq("el", "los", "las", "y", "en")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist")

  private def words(c: Column): Column = split(c, " ")

  /** Lowered token array, computed ONCE per row in its own projection.
    * Referencing the alias from a later projection is load-bearing:
    * Catalyst's CollapseProject declines to inline a non-cheap alias used
    * more than once, so the tokenization runs once instead of once per
    * downstream signal (langId reads it 5x, qualityScore 3x). Lowering the
    * whole string before the split (rather than transform(lower) after)
    * keeps both ops codegen'd scalar functions and matches the oracle's
    * `string_split(lower(text), ' ')` shape; a space is never produced or
    * consumed by lowercasing, so the token arrays are identical.
    */
  private def withToks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      words(lower(col("text"))).as("toks"))

  private def hits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, w => w.isin(stops: _*)))

  /** Whitespace tokens, BPE-ish regex tokens, and char counts per doc. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
        .cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_obs"))

  /** Heuristic quality score from length / punctuation / stopword signals.
    * All terms are row-local double arithmetic in a fixed evaluation order,
    * so any engine reproduces the score bit-exactly.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    // Base signals once per row; the ratio/score projection reuses them by
    // attribute, mirroring the oracle's `WITH b AS (...)` structure.
    val base = withToks(docs).select(
      col("doc_id"),
      size(col("toks")).cast("double").as("n_words"),
      length(col("text")).cast("double").as("n_chars"),
      length(regexp_replace(col("text"), " ", "")).cast("double").as("no_space"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("double").as("punct"),
      hits(col("toks"), StopEn).cast("double").as("stop_hits"))
    val avgWlen = col("no_space") / col("n_words")
    val stopRatio = col("stop_hits") / col("n_words")
    val punctRatio = col("punct") / col("n_chars")
    val quality =
      least(col("n_words") / lit(100.0), lit(1.0)) * 0.25 +
        stopRatio * 0.25 +
        (lit(1.0) - punctRatio) * 0.25 +
        when(avgWlen.between(3.0, 8.0), 0.25).otherwise(0.0)
    base.select(
      col("doc_id"),
      col("n_words"),
      avgWlen.as("avg_wlen"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"),
      quality.as("quality"))
  }

  /** Stopword-profile language id over {en,fr,es,de} + a CJK byte-width
    * check for zh. Deterministic argmax with a fixed preference order.
    */
  def langId(docs: DataFrame): DataFrame = {
    // Hit counts once per row in a base projection; ratios and the argmax
    // reuse the attributes instead of re-tokenizing per language.
    val base = withToks(docs).select(
      col("doc_id"),
      size(col("toks")).cast("double").as("n_words"),
      hits(col("toks"), StopEn).cast("double").as("en_h"),
      hits(col("toks"), StopFr).cast("double").as("fr_h"),
      hits(col("toks"), StopEs).cast("double").as("es_h"),
      hits(col("toks"), StopDe).cast("double").as("de_h"),
      when(octet_length(col("text")) > length(col("text")), 1.0).otherwise(0.0).as("zh"))
    val en = col("en_h") / col("n_words")
    val fr = col("fr_h") / col("n_words")
    val es = col("es_h") / col("n_words")
    val de = col("de_h") / col("n_words")
    val pred = when(col("zh") > 0, "zh")
      .when(en >= fr && en >= es && en >= de, "en")
      .when(fr >= es && fr >= de, "fr")
      .when(es >= de, "es")
      .otherwise("de")
    base.select(
      col("doc_id"),
      en.as("en_ratio"), fr.as("fr_ratio"), es.as("es_ratio"), de.as("de_ratio"),
      pred.as("pred_lang"))
  }

  /** Corpus vocabulary with term frequency (total occurrences) and
    * document frequency (docs containing the token) — the
    * tokenizer-training precursor. One shuffle keyed on the token;
    * COUNT(DISTINCT doc_id) expands map-side, aggregates exactly.
    */
  def vocabulary(docs: DataFrame): DataFrame =
    withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))

  /** PII scrubbing patterns, written with the portable regex subset ([.]
    * instead of escaped dots, [0-9] instead of perl classes) so one
    * pattern string behaves identically in Spark, DuckDB, and RE2-style
    * engines.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val LongDigitsRe = "[0-9]{10,}"

  /** Map-only PII redaction: emails and long digit runs (phone/account
    * numbers) replaced with typed placeholders, with per-doc match counts
    * kept for curation stats. Runs at scan speed over any corpus size.
    */
  def redact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "[EMAIL]"),
        LongDigitsRe, "[NUMBER]").as("clean_text"),
      size(expr(s"regexp_extract_all(text, '$EmailRe', 0)"))
        .cast("long").as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$LongDigitsRe', 0)"))
        .cast("long").as("n_numbers"))

  /** Rolling-hash fingerprint (custom codegen'd Catalyst expression) plus an
    * md5 prefix as a cheap secondary fingerprint.
    */
  def fingerprints(spark: SparkSession, docs: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    docs.select(
      col("doc_id"),
      expr("rolling_hash(text)").as("fp"),
      substring(md5(col("text")), 1, 8).as("md5_8"))
  }
}
