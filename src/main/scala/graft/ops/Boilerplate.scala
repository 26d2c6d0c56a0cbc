package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage-level (sub-document) deduplication: remove passages that recur
  * across many documents — headers, footers, license blocks, navigation
  * chrome — while keeping each document's unique content. Document-level
  * dedup (exact or near) misses these: two pages sharing a 40-word footer
  * are not near-duplicates, but a trained model still sees the footer
  * thousands of times. This is the passage analog of exact dedup: chunk
  * every document into fixed word windows, count each chunk's document
  * frequency corpus-wide, and drop chunks above a boilerplate threshold,
  * reconstructing the cleaned text in original chunk order.
  *
  * Plan shape at scale: chunking is row-local (map-only explode), the
  * document-frequency count is one hash aggregate on the chunk text
  * (map-side combined), and reconstruction is one hash aggregate keyed on
  * doc_id whose per-group state is bounded by document length — linear
  * end-to-end, no windows, no joins beyond the chunk-frequency lookup
  * (shuffle keyed on chunk text, uniform unless the corpus is one
  * repeated string). At 100 TB, chunk hashes (md5) can stand in for chunk
  * text on the frequency join to cut shuffle width; kept as text here so
  * the oracle reads directly.
  */
object Boilerplate {

  /** (doc_id, n_kept, n_removed, clean_text): drop every `chunkWords`-word
    * chunk that appears in more than `maxDocs` distinct documents.
    */
  def removeSharedPassages(docs: DataFrame, chunkWords: Int = 3,
      maxDocs: Int = 3): DataFrame = {
    require(chunkWords > 0 && maxDocs > 0, "chunkWords and maxDocs must be positive")
    val chunks = chunked(docs, chunkWords)
    // sum(cid) pins the chunk index into this branch so column pruning
    // cannot specialize its subtree below the shared chunk-keyed exchange
    // (see chunked) — the explode then runs once for both consumers (r17).
    // sum, not count: cid is non-nullable, so count(cid) would be
    // rewritten to count(1) and the pin would silently die.
    val freq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("cdf"), sum(col("cid")).as("__pin"))
      // Always true (cid >= 0 and every group is non-empty): keeps the
      // pin LIVE so pruning cannot drop cid below the shared exchange.
      .filter(col("__pin") >= 0)
      .select(col("chunk"), col("cdf"))
    chunks.join(freq, "chunk")
      .groupBy(col("doc_id"))
      .agg(
        count(when(col("cdf") <= maxDocs, 1)).as("n_kept"),
        count(when(col("cdf") > maxDocs, 1)).as("n_removed"),
        // Kept chunks reassembled in original order: sort by chunk index,
        // then join — deterministic regardless of aggregation order.
        array_join(
          transform(
            sort_array(collect_list(
              when(col("cdf") <= maxDocs, struct(col("cid"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"))
  }

  /** C4-style corpus-level chunk deduplication (Raffel et al. 2020 §2.2:
    * "we discarded all but one of any three-sentence span occurring more
    * than once in the data set") re-expressed over fixed word chunks: a
    * chunk that occurs more than once ANYWHERE in the corpus survives only
    * at its globally-first occurrence — smallest (doc_id, chunk index) —
    * and every later occurrence, in the same document or another, is cut.
    * [[removeSharedPassages]] drops high-document-frequency boilerplate
    * from EVERY document; this is the complementary policy that keeps
    * exactly one copy of every span in the corpus.
    *
    * Plan shape at scale: chunking is a row-local map-only explode; the
    * global first occurrence is ONE hash aggregate on the chunk text whose
    * argmin is a plain MIN over the (doc_id << 32 | cid) encoding (so it
    * map-side-combines — no window, no sort); the keep decision is a
    * row-local comparison after the chunk-frequency equi-join; and
    * reconstruction is one aggregate keyed on doc_id with per-group state
    * bounded by document length. Integer arithmetic end to end — any
    * engine derives the identical survivor set.
    *
    * Returns (doc_id, n_kept, n_removed, clean_text).
    */
  def dedupChunksKeepFirst(docs: DataFrame, chunkWords: Int = 5): DataFrame = {
    require(chunkWords > 0, "chunkWords must be positive")
    val chunks = chunked(docs, chunkWords)
    val occ = lit(4294967296L) * col("doc_id") + col("cid")
    val first = chunks.groupBy(col("chunk"))
      .agg(min(lit(4294967296L) * col("doc_id") + col("cid")).as("first_occ"),
        count(lit(1)).as("n_occ"))
    val kept = col("n_occ") === 1 || occ === col("first_occ")
    chunks.join(first, "chunk")
      .groupBy(col("doc_id"))
      .agg(
        count(when(kept, 1)).as("n_kept"),
        count(when(!kept, 1)).as("n_removed"),
        array_join(
          transform(
            sort_array(collect_list(when(kept, struct(col("cid"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"))
  }

  /** Row-local fixed-window chunking: each doc's word array cut into
    * `chunkWords`-word pieces (last piece ragged), emitted with its
    * 0-based chunk index.
    */
  private def chunked(docs: DataFrame, chunkWords: Int): DataFrame = {
    val cw = chunkWords
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(ceil(size(ws) / $cw.0) AS INT) - 1), " +
          s"i -> array_join(slice(ws, i * $cw + 1, $cw), ' '))"))
        .as(Seq("cid", "chunk")))
      // The chunk-keyed exchange is the share point for both consumers in
      // each caller (the frequency aggregate and the reconstruction join):
      // the frequency aggregates run exchange-free on it ({chunk} is a
      // subset of every key set) and the join side reuses the shuffle, so
      // the corpus is chunked ONCE (r17; was one explode pass per branch,
      // plus a corpus-wide (chunk, doc_id) dedup exchange).
      .repartition(col("chunk"))
  }
}
