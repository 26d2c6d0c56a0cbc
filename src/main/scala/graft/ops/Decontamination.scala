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

  /** Same answer as [[ngramOverlap]], executed with a Bloom prefilter:
    * the benchmark's shingle set is sketched once (treeAggregate — the
    * only imperative step, and it builds a bounded-size sketch, not
    * data), and the CORPUS side drops non-candidate shingles at scan
    * speed before the shuffle. At 100 TB this is the difference between
    * shuffling every corpus shingle and shuffling only the ~fpp false
    * positives plus true hits; the exact join over survivors removes the
    * false positives, so the result is still exact.
    *
    * `expectedItems` sizes the sketch (default 1M ≈ 1.2 MB at 1% fpp;
    * size it to the benchmark's distinct-shingle count at scale).
    */
  private val bloomFnCounter = new java.util.concurrent.atomic.AtomicLong()

  def ngramOverlapBloom(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8, minShared: Int = 3,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val bs = Dedup.shingles(benchmark, n)
      .select(col("doc_id").as("bench_doc_id"), col("shingle"))
    val bloom = bs.select(col("shingle"))
      .rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, row) => { f.putString(row.getString(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    // A runtime object can't ride a SQL string into expr(); a uniquely
    // named temp function whose builder closes over the filter carries it
    // into the plan (resolution inlines the expression, so later
    // registrations can't clobber this query).
    val fname = s"graft_bloom_probe_${bloomFnCounter.incrementAndGet()}"
    corpus.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.BloomMightContainString(exprs.head, bloom),
      "built-in")
    val cs = Dedup.shingles(corpus, n)
      .select(col("doc_id").as("corpus_doc_id"), col("shingle"))
      .filter(expr(s"$fname(shingle)"))
    bs.join(cs, "shingle")
      .filter(col("bench_doc_id") =!= col("corpus_doc_id"))
      .groupBy(col("bench_doc_id"), col("corpus_doc_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** SEMANTIC decontamination: corpus items whose embedding is within
    * `threshold` cosine of some benchmark item — catches paraphrased
    * contamination that no n-gram check can (the text shares no
    * shingles, the meaning leaks anyway). Emits
    * (bench_id, corpus_id, cos) for every qualifying pair.
    *
    * Scale shape: the benchmark is small by definition, so its vectors
    * BROADCAST and the corpus side streams through the codegen'd
    * `vec_dot` at scan speed — linear in corpus size, no shuffle of the
    * corpus, unlike the quadratic all-pairs form
    * (Similarity.nearDupPairs). Cost is corpus x |benchmark| dot
    * products, the same shape as brute-force ANN scoring.
    *
    * `excludeSameId` is ONLY for benchmarks sampled from the corpus
    * itself (same id space — a row trivially matches itself). For an
    * EXTERNAL benchmark, pass false: its ids are unrelated to corpus
    * ids, and excluding numerically-equal pairs would silently hide
    * true contamination.
    */
  def embeddingOverlap(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double, excludeSameId: Boolean = true): DataFrame = {
    val n = Similarity.normalized(corpus)
    val b = Similarity.normalized(benchmark).select(
      col("vec_id").as("bench_id"), col("v").as("bv"), col("nrm").as("bn"))
    val joinCond =
      if (excludeSameId) col("vec_id") =!= col("bench_id") else lit(true)
    n.join(broadcast(b), joinCond)
      .withColumn("cos", expr("vec_dot(bv, v)") / (col("bn") * col("nrm")))
      .filter(col("cos") >= threshold)
      .select(col("bench_id"), col("vec_id").as("corpus_id"), col("cos"))
  }
}
