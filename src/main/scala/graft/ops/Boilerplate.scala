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
    val cw = chunkWords
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST(ceil(size(ws) / $cw.0) AS INT) - 1), " +
          s"i -> array_join(slice(ws, i * $cw + 1, $cw), ' '))"))
        .as(Seq("cid", "chunk")))
    val freq = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("cdf"))
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
}
