package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text signals that need aggregation (unlike the row-local
  * TextOps): repetition profiling, distinctive-term extraction, and
  * token-window chunking. All outputs are integers/strings so any engine
  * reproduces them bit-exactly.
  */
object CorpusSignals {

  /** Gopher-style repetition signals per document: total word count, the
    * occurrence count of the most frequent word, and how many 2-gram
    * occurrences are repeats (total minus distinct). High values flag
    * boilerplate/spam for curation filters.
    *
    * Scale shape: explode + two hash aggregates keyed on (doc_id, token)
    * then doc_id — map-side partial aggregation bounds shuffle volume by
    * the per-partition distinct token count, and no stage ever holds more
    * than one doc's counts. Linear at any corpus size.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col("doc_id"), lower(col("text")).as("lt"))
    val wc = toks
      .select(col("doc_id"), explode(split(col("lt"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    val top = wc.groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_word_n"), sum(col("c")).as("n_words"))
    val grams = toks
      .select(col("doc_id"), explode(expr("ngram_shingles(lt, 2)")).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_2grams"),
        countDistinct(col("g")).as("n_distinct_2grams"))
    top.join(grams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("top_word_n"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        coalesce(col("n_2grams") - col("n_distinct_2grams"), lit(0L)).as("dup_2grams"))
  }

  /** The corpus-RAREST term each document contains (minimum document
    * frequency, ties broken by term) — distinctive-term tagging, the
    * integer-exact cousin of tf-idf keyword extraction (argmax of
    * idf alone, so no float log/division enters the result).
    *
    * Scale shape: distinct (doc_id, term) pairs -> df aggregate keyed on
    * the term -> join back on the term -> per-doc min. Two shuffles on
    * the term, one on doc_id; the df relation is vocabulary-sized.
    */
  def rarestTerm(docs: DataFrame): DataFrame = {
    val docTerms = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .distinct()
    val dfreq = docTerms.groupBy(col("w")).agg(count(lit(1)).as("df"))
    docTerms.join(dfreq, "w")
      .groupBy(col("doc_id"))
      .agg(min(struct(col("df"), col("w"))).as("m"))
      .select(col("doc_id"), col("m.w").as("rare_term"), col("m.df").as("df"))
  }

  /** Cross-document n-gram NOVELTY: per doc, how many of its distinct
    * word n-grams appear in no other document (df == 1), against its
    * total distinct n-grams. The complement of near-dup detection as a
    * per-document score — boilerplate-heavy or duplicated docs score low,
    * original text scores high — and a standard curation signal for
    * data-mixing decisions. Integer counts plus one IEEE division, so
    * any engine reproduces it exactly.
    *
    * Scale shape: a doc's distinct grams are ROW-LOCAL (array_distinct
    * over its own shingle array), so the per-doc denominator needs no
    * shuffle at all; and a df==1 gram belongs to exactly ONE doc, so a
    * single gram-keyed aggregate (count + min doc_id, both map-side
    * combinable) pins each unique gram to its owner and the numerator is
    * a doc-keyed count over unique grams only. One corpus-sized shuffle
    * total — the (doc,gram)-keyed distinct shuffle, the gram-keyed join
    * back, and the final corpus-sized per-doc regroup of the naive form
    * never happen.
    */
  def ngramNovelty(docs: DataFrame, n: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    def distinctGrams = array_distinct(expr(s"ngram_shingles(lower(text), $n)"))
    val perDoc = docs
      .select(col("doc_id"), size(distinctGrams).cast("long").as("n_distinct_grams"))
      .filter(col("n_distinct_grams") > 0)
    val uniquePerDoc = docs
      .select(col("doc_id"), explode(distinctGrams).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("gdf"), min(col("doc_id")).as("doc_id"))
      .filter(col("gdf") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_unique_grams"))
    perDoc.join(uniquePerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_distinct_grams"),
        coalesce(col("n_unique_grams"), lit(0L)).as("n_unique_grams"),
        (coalesce(col("n_unique_grams"), lit(0L)).cast("double")
          / col("n_distinct_grams").cast("double")).as("novelty"))
  }

  /** Out-of-vocabulary rate against a frequency-truncated vocabulary: the
    * top `vocabSize` corpus tokens by total frequency (deterministic
    * tiebreak on the token) are "in vocabulary"; each document reports
    * its token count, OOV count, and OOV ratio — the signal that decides
    * whether a tokenizer's vocab covers a corpus slice, and a standard
    * mixing/curation input.
    *
    * Scale shape: vocabulary truncation is ORDER BY + LIMIT
    * (TakeOrderedAndProject — distributed partial top-k, no global
    * sort), the truncated vocab broadcasts, and the per-doc counts are
    * one hash aggregate. Integer counts + one division: exact on any
    * engine.
    */
  def oovRate(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    toks
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Overlapping token-window chunks — the retrieval/context-window prep
    * step. Chunk k covers tokens [k*stride, k*stride + window); the last
    * chunk starts at the smallest multiple of stride reaching the tail.
    * Emits (doc_id, chunk_idx, n_chunk_tokens, chunk_md5) — the md5
    * stands in for the chunk text to keep results compact; the text
    * itself is `concat_ws` of the same slice.
    *
    * Scale shape: map-only (generate indices + slice per row, explode) —
    * no shuffle, runs at scan speed and stays in whole-stage codegen.
    */
  def chunk(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"sequence(0, (greatest(size(toks) - $window, 0) + ${stride - 1}) div $stride)"))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(s"slice(toks, chunk_idx * $stride + 1, $window)").as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
  }

  /** Top-k terms per group (language, source, domain …) — the corpus
    * profiling/reporting cut behind "what does each slice look like".
    *
    * Scale shape: one map-side-combinable hash aggregate keyed on
    * (group, term) collapses the corpus to the per-group vocabulary;
    * the rank window then shuffles ONLY that aggregated relation,
    * partitioned by group. Parallelism is bounded by the group count —
    * fine for profiling dimensions (languages, sources); for a
    * high-cardinality group key the same plan degenerates gracefully
    * since each partition holds one group's vocabulary, never the corpus.
    */
  def topTermsPerGroup(docs: DataFrame, group: Column, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(group.as("grp"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("grp")).orderBy(col("cnt").desc, col("term")))
        .cast("int"))
      .filter(col("rk") <= k)
  }

  /** Adjacent-word co-occurrence lift — collocation mining over the
    * corpus: for the top-k most frequent adjacent pairs, lift =
    * P(w1,w2) / (P(w1 in left slot) * P(w2 in right slot)), computed as
    * (n_ab * N) / (n_a * n_b) over positional pair counts. Lift > 1
    * marks genuine collocations vs frequency coincidence (PMI without
    * the log, so no transcendental-function drift between engines).
    *
    * Scale shape: the corpus-wide split+explode is paid ONCE, into the
    * (w1, w2) pair-count aggregate; the positional marginals and total
    * are integer-identical SUMs of that aggregate (n_a = Σ n_ab over
    * w2, etc.), so they run over the pair-vocabulary relation, not the
    * corpus. ReuseExchange materializes the shared aggregate's shuffle
    * once per action for all four consumers (no persisted blocks
    * outlive the query). The top-k cut is a distributed TakeOrdered (never a
    * global sort), and the marginal joins stream the vocabulary-sized
    * sides against the broadcast k-row top list. Integer counts; the
    * lift is three fixed-order IEEE ops, reproducible anywhere.
    */
  def cooccurrenceLift(docs: DataFrame, k: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(split(lower(col("text")), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
          |  i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))""".stripMargin))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      // element_at is nullable-typed, so the marginal joins infer
      // isnotnull(w1) / isnotnull(w2) on DIFFERENT branches of the shared
      // pair aggregate, splitting it into per-consumer subtrees. Stating
      // both filters here keeps every consumer's subtree identical so the
      // pair-count exchange is reused (r17); in-range element_at never
      // actually yields null, so no row is dropped.
      .filter(col("w1").isNotNull && col("w2").isNotNull)
    // No persist: the four consumers below (marginals, total, top-k)
    // share this identical aggregate subtree, so ReuseExchange
    // materializes its shuffle once per action — without block-manager
    // state outliving the query (the Dedup lesson).
    val c = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val la = c.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
    val rb = c.groupBy(col("w2")).agg(sum(col("n_ab")).as("n_b"))
    val tot = c.agg(sum(col("n_ab")).as("nn"))
    // Top-k FIRST (TakeOrderedAndProject), then rank the k survivors —
    // the window sorts k rows, not the pair vocabulary.
    val top = c.orderBy(col("n_ab").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_ab").desc, col("w1"), col("w2"))).cast("int"))
    rb.join(broadcast(la.join(broadcast(top), "w1")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab").cast("long").as("n_ab"), col("rk"),
        ((col("n_ab").cast("double") * col("nn").cast("double"))
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** Coverage-targeted vocabulary truncation — the tokenizer/embedding
    * vocab-building rule "keep the smallest frequency-ranked vocabulary
    * covering >= covNum/covDen of all token occurrences" (the classic
    * 95%-coverage cut of subword/word-vector pipelines). Terms are
    * admitted in (count desc, term) rank order while the coverage BEFORE
    * the term is still short of the target — the same exclusive-prefix
    * admission as the token-budget mixer, so exactly the crossing term is
    * the last one in. The test is the cleared-denominator integer
    * inequality (cum_before * covDen < covNum * total): no division, no
    * float, bit-identical in any engine.
    *
    * Scale shape: the corpus is touched ONCE by the explode + count
    * hash aggregate (map-side combinable); everything after runs on the
    * vocabulary-sized relation — [[GlobalRank.prefixSum]] range-
    * repartitions the vocab, never the corpus, and the 1-row total
    * broadcasts. No single-reducer window at any scale.
    */
  def vocabCoverage(docs: DataFrame, covNum: Int = 95,
      covDen: Int = 100): DataFrame = {
    require(covNum > 0 && covNum <= covDen, "coverage must be in (0, 1]")
    val vocab = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("long").as("total"))
    GlobalRank.prefixSum(vocab, Seq(col("cnt").desc, col("word")),
        col("cnt"), "cum_count")
      .withColumn("cum_count", col("cum_count").cast("long"))
      .crossJoin(broadcast(total))
      .filter((col("cum_count") - col("cnt")) * covDen < lit(covNum) * col("total"))
      .select(col("word"), col("cnt"), col("cum_count"))
  }

  /** Per-source distribution drift over the top-K corpus tokens — the
    * domain-shift check a data card publishes when one source starts
    * dominating a mix: for each (source, top token), is the token over-
    * or under-represented by more than `factor`× its corpus rate?
    *
    * The rate test is a cleared-denominator integer inequality
    * (n_src · N_total vs factor · n_tot · N_src — products in
    * decimal(38,0), exact past 100 TB token counts), so the flags are
    * bit-identical in any engine: no ratio, no float, no log.
    *
    * Scale shape: ONE tokenize pass feeds ONE map-side-combinable
    * (word, source) count aggregate whose exchange every statistic
    * reuses (word totals, source totals, grand total, source×top-word
    * counts — all integer-identical sums of it over the vocab×sources
    * bounded relation). Top-K is a
    * TakeOrdered, never a global sort; the (source × top-K) grid is a
    * broadcast cross of two tiny relations. Missing (source, word)
    * combinations surface as n_src = 0 — absence of a frequent token IS
    * the drift signal, so the grid left-join is load-bearing.
    */
  def sourceDrift(docs: DataFrame, topK: Int = 50, factor: Int = 2): DataFrame = {
    // isnotnull(source) matches the filter the grid's left join infers on
    // the srcWord branch — stated up front so all four consumers of the
    // shared aggregate stay canonically identical (sources are never null
    // in a generated corpus, so no row is dropped).
    val tok = docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "" && col("source").isNotNull)
    // ONE corpus-wide (word, source) count aggregate; every statistic
    // below is an integer-identical SUM of it over the vocab×sources
    // bounded relation, so the tokenize pass runs once (r17; was one
    // explode pass per consumer — four corpus passes).
    val c = tok.groupBy(col("word"), col("source")).agg(count(lit(1)).as("n"))
    val top = c.groupBy(col("word")).agg(sum(col("n")).as("n_tot"))
      .orderBy(col("n_tot").desc, col("word")).limit(topK)
    val srcTotals = c.groupBy(col("source")).agg(sum(col("n")).as("n_src_total"))
    val grandTotal = c.agg(sum(col("n")).as("n_total"))
    val srcWord = c.join(broadcast(top.select(col("word"))), "word")
      .select(col("source"), col("word"), col("n").as("n_src_raw"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    srcTotals.crossJoin(broadcast(top))
      .join(srcWord, Seq("source", "word"), "left")
      .crossJoin(broadcast(grandTotal))
      .select(
        col("source"), col("word"),
        coalesce(col("n_src_raw"), lit(0L)).as("n_src"),
        col("n_tot"),
        (dec(coalesce(col("n_src_raw"), lit(0L))) * dec(col("n_total")) >
          lit(factor) * dec(col("n_tot")) * dec(col("n_src_total"))).as("over_rep"),
        (lit(factor) * dec(coalesce(col("n_src_raw"), lit(0L))) * dec(col("n_total")) <
          dec(col("n_tot")) * dec(col("n_src_total"))).as("under_rep"))
  }
}
