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

  private def hits(c: Column, stops: Seq[String]): Column =
    size(filter(transform(words(c), w => lower(w)), w => w.isin(stops: _*)))

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
    val nWords = size(words(col("text"))).cast("double")
    val nChars = length(col("text")).cast("double")
    val noSpace = length(regexp_replace(col("text"), " ", "")).cast("double")
    val punct =
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("double")
    val avgWlen = noSpace / nWords
    val stopRatio = hits(col("text"), StopEn).cast("double") / nWords
    val punctRatio = punct / nChars
    val quality =
      least(nWords / lit(100.0), lit(1.0)) * 0.25 +
        stopRatio * 0.25 +
        (lit(1.0) - punctRatio) * 0.25 +
        when(avgWlen.between(3.0, 8.0), 0.25).otherwise(0.0)
    docs.select(
      col("doc_id"),
      nWords.as("n_words"),
      avgWlen.as("avg_wlen"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stop_ratio"),
      quality.as("quality"))
  }

  /** Stopword-profile language id over {en,fr,es,de} + a CJK byte-width
    * check for zh. Deterministic argmax with a fixed preference order.
    */
  def langId(docs: DataFrame): DataFrame = {
    val nWords = size(words(col("text"))).cast("double")
    val en = hits(col("text"), StopEn).cast("double") / nWords
    val fr = hits(col("text"), StopFr).cast("double") / nWords
    val es = hits(col("text"), StopEs).cast("double") / nWords
    val de = hits(col("text"), StopDe).cast("double") / nWords
    val zh = when(octet_length(col("text")) > length(col("text")), 1.0).otherwise(0.0)
    val pred = when(zh > 0, "zh")
      .when(en >= fr && en >= es && en >= de, "en")
      .when(fr >= es && fr >= de, "fr")
      .when(es >= de, "es")
      .otherwise("de")
    docs.select(
      col("doc_id"),
      en.as("en_ratio"), fr.as("fr_ratio"), es.as("es_ratio"), de.as("de_ratio"),
      pred.as("pred_lang"))
  }

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
