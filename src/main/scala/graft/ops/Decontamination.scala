package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents that leak evaluation
  * content, so they can be dropped before training. Two standard
  * criteria, both shaped as hash-partitioned equi-joins (no all-pairs):
  *
  *  - exact: identical content hash (md5) between corpus and benchmark;
  *  - n-gram: the corpus doc shares at least `minShared` distinct word
  *    n-grams with a benchmark doc (the "13-gram overlap" family of
  *    checks, parameterized) — catches paraphrase-light contamination
  *    that exact hashing misses.
  *
  * The benchmark side is normally tiny next to the corpus, so its
  * shingle index broadcasts; the corpus side streams through the join at
  * scan speed.
  */
object Decontamination {

  /** (bench_doc_id, corpus_doc_id) pairs with identical content hash,
    * self-matches excluded. `prefixLen` hashes only the first k chars —
    * prefix contamination catches documents that copy a benchmark item
    * and then diverge (truncation, appended noise), which full-text
    * hashing misses; 0 means hash the whole text.
    */
  def exactOverlap(corpus: DataFrame, benchmark: DataFrame,
      prefixLen: Int = 0): DataFrame = {
    def key(c: org.apache.spark.sql.Column) =
      md5(if (prefixLen > 0) substring(c, 1, prefixLen) else c)
    val c = corpus.select(col("doc_id").as("corpus_doc_id"), key(col("text")).as("h"))
    val b = benchmark.select(col("doc_id").as("bench_doc_id"), key(col("text")).as("h"))
    b.join(c, "h")
      .filter(col("bench_doc_id") =!= col("corpus_doc_id"))
      .select(col("bench_doc_id"), col("corpus_doc_id"))
  }

  /** (bench_doc_id, corpus_doc_id, shared) pairs sharing >= minShared
    * distinct word n-grams, self-matches excluded.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8, minShared: Int = 3): DataFrame = {
    val cs = Dedup.shingles(corpus, n)
      .select(col("doc_id").as("corpus_doc_id"), col("shingle"))
    val bs = Dedup.shingles(benchmark, n)
      .select(col("doc_id").as("bench_doc_id"), col("shingle"))
    bs.join(cs, "shingle")
      .filter(col("bench_doc_id") =!= col("corpus_doc_id"))
      .groupBy(col("bench_doc_id"), col("corpus_doc_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
