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

  /** Largest bigram-LM vocabulary (distinct pairs) [[bigramSurprisal]]'s
    * explicit `"broadcast"` strategy is sized for. At ~40 bytes/entry
    * (pair string + long) 8M pairs is a ~320 MB broadcast — a
    * deliberately conservative bound, comfortably under the 8 GB
    * broadcast cap and a 1000-executor driver's heap. The default
    * `"auto"` strategy no longer probes against this constant (it lets
    * AQE pick from the measured stage size at runtime); the bound
    * remains the documented safety line for callers forcing broadcast.
    */
  val BroadcastPairLimit: Long = 8L * 1000 * 1000

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

  /** Integerized unigram-surprisal quality score — the CCNet-style
    * language-model filter (docs whose tokens are improbable under a
    * corpus LM are boilerplate/garbage candidates), made cross-engine
    * bit-exact: a token's surprisal is floor(log2(n_docs / df)) computed
    * PURELY in integers as `length(bin(n_docs div df)) - 1` (the bit
    * length of the integer ratio), so no transcendental log ever runs.
    * Emits (doc_id, n_tokens, surprisal_bits); the mean-bits-per-token
    * division is left to the reader, like [[graft.ops.Report]].
    *
    * Scale shape: token explode → one (doc_id, term) aggregate → df join
    * keyed on the term → one per-doc aggregate. Both aggregates are
    * map-side combinable; the df relation is vocabulary-sized, not
    * corpus-sized, and n_docs is a 1-row broadcast.
    */
  def surprisalScore(docs: DataFrame): DataFrame = {
    val tf = withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    // sum(tf) is the duplicate-sensitive pin that stops column pruning
    // from stripping tf's count out of this branch — both consumers then
    // canonicalize to ONE (doc_id, word) exchange and the token explode
    // runs once (r17; was two full explode passes).
    val df = tf.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("__pin"))
      // Always true (tf >= 1): keeps the pin LIVE so pruning cannot
      // specialize this branch's subtree away from the shared exchange.
      .filter(col("__pin") > 0)
      .select(col("word"), col("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    tf.join(df, "word")
      .crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * (length(bin(expr("n_docs div df"))) - 1))
          .cast("long").as("surprisal_bits"))
  }

  /** Gopher/C4-style quality-rule flags (Rae et al. 2021 §A1.1; Raffel
    * et al. 2020 §2.2) — the named rule-based filter battery every web
    * corpus runs before model training, each rule stated as an INTEGER
    * inequality so no division or float ever enters a verdict:
    *
    *  - ok_word_count:    minWords <= n_words <= maxWords
    *  - ok_mean_word_len: 3 <= mean token length <= 10, tested as
    *                      3*n_words <= sum_len && sum_len <= 10*n_words
    *  - ok_repetition:    dominant token under 1/8 of the doc
    *                      (max_tf * 8 <= n_words) — the duplicate-text
    *                      symptom Gopher's repetition rules target
    *  - ok_stopwords:     >= 2 distinct common words present (Gopher's
    *                      "stop word" requirement)
    *  - ends_punct / has_brace: C4's terminal-punctuation and code-like
    *                      `{` signals, reported but NOT gating `keep`
    *                      (constant on a punctuation-free corpus)
    *
    * `keep` is the AND of the four Gopher-core rules. Scale shape: one
    * (doc_id, token) aggregate → one per-doc aggregate (both map-side
    * combinable) joined with a map-only char-flag branch on doc_id — the
    * aggregate output is already hash-partitioned on doc_id, so the join
    * adds no extra corpus shuffle.
    */
  def gopherC4Flags(docs: DataFrame, minWords: Int = 20,
      maxWords: Int = 100000, stops: Seq[String] = StopEn): DataFrame = {
    val tf = withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("doc_id")).agg(
      sum(col("tf")).cast("long").as("n_words"),
      max(col("tf")).cast("long").as("max_tf"),
      sum(col("tf") * length(col("w"))).cast("long").as("sum_len"),
      sum(when(col("w").isin(stops: _*), 1L).otherwise(0L))
        .cast("long").as("stop_distinct"))
    val charFlags = docs.select(
      col("doc_id"),
      col("text").rlike("[.!?]$").as("ends_punct"),
      col("text").contains("{").as("has_brace"))
    stats.join(charFlags, "doc_id")
      .select(
        col("doc_id"), col("n_words"), col("max_tf"), col("stop_distinct"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_word_count"),
        (lit(3) * col("n_words") <= col("sum_len") &&
          col("sum_len") <= lit(10) * col("n_words")).as("ok_mean_word_len"),
        (col("max_tf") * 8 <= col("n_words")).as("ok_repetition"),
        (col("stop_distinct") >= 2).as("ok_stopwords"),
        col("ends_punct"), col("has_brace"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_repetition") && col("ok_stopwords"))
  }

  /** Bigram language-model training (the KenLM-style counting pass) plus
    * the greedy next-token table: adjacent-token pair counts over the
    * corpus, and for each of the `topContexts` highest-volume contexts
    * the argmax continuation — (context, n_total, top_next, top_cnt).
    * Count ties go to the lexicographically LARGEST continuation: one
    * struct max supplies both fields consistently, and a fixed rule
    * either way keeps the table deterministic.
    *
    * Scale shape: pair generation is ROW-LOCAL (a transform over the
    * token array — no self-join of the token relation on position, which
    * would shuffle the corpus twice); then ONE (w1, w2) count aggregate,
    * one per-context max_by/sum aggregate (both map-side combinable) and
    * a top-k TakeOrdered on the context relation — vocabulary²-bounded,
    * never corpus-bounded.
    */
  def bigramLm(docs: DataFrame, topContexts: Int = 20): DataFrame = {
    val pairs = withToks(docs)
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.w1").as("context"), col("p.w2").as("next"))
      .agg(count(lit(1)).as("cnt"))
    pairs.groupBy(col("context"))
      .agg(
        sum(col("cnt")).cast("long").as("n_total"),
        max_by(col("next"), struct(col("cnt"), col("next"))).as("top_next"),
        max(struct(col("cnt"), col("next"))).getField("cnt")
          .cast("long").as("top_cnt"))
      .orderBy(col("n_total").desc, col("context"))
      .limit(topContexts)
  }

  /** Bigram-LM document scoring — the APPLY step of the CCNet-style LM
    * quality filter (Wenzek et al. 2020 §4.3 score with a corpus-trained
    * LM; p78 is the training pass, this is the per-document perplexity
    * proxy). Each adjacent pair contributes its integerized surprisal
    * floor(log2(n_ctx / n_pair)) — a pure bit-length over an integer
    * quotient like p75, so no transcendental log and the score is
    * bit-identical in any engine. Emitted as (doc_id, n_pairs,
    * bigram_bits): high bits-per-pair = improbable continuations =
    * likely-noisy text; the division into a rate is left to the reader.
    * Every doc pair exists in the corpus counts (the doc contributes its
    * own pairs), so the quotient is always >= 1 and the join never drops
    * a row.
    *
    * Scale shape: pair generation AND the per-document pair counts are
    * ROW-LOCAL — the codegen'd [[graft.functions.PairCounts]] kernel
    * collapses a document's duplicate pairs before anything explodes, so
    * the exploded stream carries one (doc, pair, c) row per DISTINCT
    * pair per document (the old per-occurrence struct transform ran its
    * lambda frames interpreted). The corpus pair/context counts are
    * vocabulary²-bounded map-side combinable aggregates, and their
    * per-pair bit lengths are pre-joined on that SMALL relation — so the
    * corpus-sized pair stream crosses the wire exactly twice (once
    * combined into the pair counts, once re-keyed for the single bits
    * join), and the final per-doc aggregate partial-combines before its
    * shuffle. The two-join form (pair counts, then context counts) would
    * re-shuffle the corpus-sized relation once per join; pre-reducing
    * bits to one lookup table halves that. The map-only pair lineage is
    * computed once per consumer rather than pinned behind a shared
    * aggregate exchange (A/B at the 10x slice: the extra corpus-sized
    * shuffle costs more than the re-scan saves).
    */
  def bigramSurprisal(docs: DataFrame, joinStrategy: String = "auto"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val pairs = withToks(docs)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr("pair_counts(toks)")).as(Seq("pair", "c")))
    val pairCounts = pairs.groupBy(col("pair"))
      .agg(sum(col("c")).cast("long").as("n_pair"))
    // Tokens split on the space, so the pair key's first space always
    // separates w1 from w2 — substring_index recovers the context word.
    val ctxCounts = pairCounts
      .groupBy(substring_index(col("pair"), " ", 1).as("w1"))
      .agg(sum(col("n_pair")).cast("long").as("n_ctx"))
    val bits = pairCounts
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .join(ctxCounts, "w1")
      .select(col("pair"), (length(bin(expr("n_ctx div n_pair"))) - 1).as("bits"))
    // The bits table is the corpus bigram LM — model state, exactly what
    // production CCNet ships to every scoring node — bounded by OBSERVED
    // distinct pairs, not corpus rows (3.9k at the 100x fixture; low
    // millions for a real web vocabulary). Broadcasting it keeps the
    // corpus-sized pair stream map-only end to end: its only exchange
    // left is the partial-combined per-doc aggregate. (The r11 form
    // shuffle_hash-joined here, paying a full exchange of the 27M-row
    // stream at 100x — the single largest cost of the surprisal family.)
    //
    // "auto" (the default) leaves the join UNHINTED and lets the engine
    // decide from MEASURED sizes at runtime, with zero construction-time
    // Spark jobs and zero persists for the caller's thread to drain
    // (VERDICT r14 #4: plan-only callers were surprised by "auto"
    // running a count-probe job at DataFrame construction). The contract
    // is the SESSION'S join tuning, stated here so the trade is explicit
    // rather than a silent threshold change from the r14 probe:
    //   - bits stage ≤ spark.sql.autoBroadcastJoinThreshold (10 MB
    //     default ≈ 250k pairs): AQE converts to broadcast and the local
    //     shuffle reader keeps the pair stream's exchange node-local —
    //     measured: an unhinted join over an unknown-stats aggregate
    //     finishes as BroadcastHashJoin, while ANY join-strategy hint
    //     suppresses the runtime upgrade.
    //   - larger: a shuffle join, whose physical form follows the
    //     session (spark.sql.join.preferSortMergeJoin=false upgrades it
    //     to shuffle_hash up to threshold × shuffle-partitions ≈ the old
    //     [[BroadcastPairLimit]] scale).
    // A caller whose LM sits in the 10 MB–320 MB window the r14 probe
    // used to broadcast should say so: pass "broadcast" (map-only;
    // caller owns the [[BroadcastPairLimit]] sizing — what the corpus
    // cards do) or "shuffle_hash" (never builds a driver-side table,
    // never sorts the stream), or raise the session threshold.
    val bitsJoined = joinStrategy match {
      case "broadcast"    => pairs.join(broadcast(bits), Seq("pair"))
      case "shuffle_hash" => pairs.join(bits.hint("shuffle_hash"), Seq("pair"))
      case "auto"         => pairs.join(bits, Seq("pair"))
      case other => throw new IllegalArgumentException(
        s"joinStrategy must be auto | broadcast | shuffle_hash, got: $other")
    }
    // Aggregate order (bits-sum FIRST) matters for plan reuse, not
    // values: perplexityBuckets consumes this aggregate on two branches
    // whose project-collapse rewrites the function list into downstream
    // REFERENCE order, which is [sum(c*bits), sum(c)] on both once the
    // ppl_scaled projection leads with bigram_bits — emitting that order
    // natively (no restoring select, which would itself collapse and
    // rewrite the order back) makes both consumers' partial-aggregate
    // exchanges canonically identical, so AQE materializes the corpus
    // scoring shuffle ONCE (ReusedExchange) instead of re-running the
    // scan per consumer. Column order is not part of the contract (the
    // gate sorts columns by name); the schema is.
    bitsJoined
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c") * col("bits")).cast("long").as("bigram_bits"),
        sum(col("c")).cast("long").as("n_pairs"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: score
    * every document with the corpus LM, sort, and split into head /
    * middle / tail thirds — the bucket column downstream pipelines
    * sample from, keeping "head" and discarding or down-weighting
    * "tail"). The score is [[bigramSurprisal]]'s integer bits
    * NORMALIZED to a rate without ever producing a float:
    * ppl_scaled = (bigram_bits << scaleBits) div n_pairs — an exact
    * integer both engines floor identically (2^20 scale keeps three
    * fractional-bit decimals of resolution). Buckets are EXACT global
    * NTILE thirds via [[GlobalRank.ntile]]'s range-repartition +
    * partition-offset construction: identical boundaries to the
    * single-reducer window, with no single-reducer sort anywhere.
    * Documents with fewer than two tokens have no pairs and no bucket.
    *
    * Returns (doc_id, n_pairs, ppl_scaled, bucket) with bucket 1 = head
    * (most predictable) .. `buckets` = tail.
    */
  def perplexityBuckets(docs: DataFrame, buckets: Int = 3,
      scaleBits: Int = 20, joinStrategy: String = "auto"): DataFrame = {
    require(buckets > 0 && scaleBits >= 0 && scaleBits < 22,
      "buckets must be positive; scaleBits in [0, 22) keeps the product exact")
    // NOT persisted (r16): ntileByValue's bounded path consumes the
    // scored relation on exactly two branches (value counts + the
    // windowed data pass), and both share the per-doc aggregate EXCHANGE
    // at the tail of the surprisal lineage — AQE's ReusedExchange
    // materializes that shuffle once and each branch re-runs only the
    // final hash-aggregate over it, so the expensive corpus lineage
    // never executes twice. The r12 persist predates this shape: the
    // range-ntile then had THREE consumers (incl. the range sampler) and
    // pinning beat triple recomputation; with two identical consumers
    // the r13 CMS/HLL measurement holds — letting ReusedExchange share
    // the shuffle beats an InMemoryRelation materialization barrier
    // (100x: 12.5 -> ~10.5 s steady, two 32-task persist jobs gone).
    // Column order here (ppl_scaled BEFORE n_pairs) is part of the reuse
    // contract: project-collapse rewrites each consumer's aggregate into
    // downstream REFERENCE order, and the counts branch keeps only
    // ppl_scaled (references bits-sum first) — listing ppl_scaled first
    // makes the window branch collapse to the same [sum(c*bits), sum(c)]
    // function order, so the two partial-aggregate exchanges canonicalize
    // identically and reuse. The public output order is restored below.
    // CONTRACT VERSION NOTE (ADVICE r16): this reuse rides runtime AQE
    // canonicalization behavior validated on Spark 4.1.2 (the shipped
    // jars); PlanAuditSpec pins ReusedExchange on the EXECUTED plan, so
    // a Spark upgrade that breaks the contract fails that spec rather
    // than silently re-running the scoring lineage twice.
    val scored = bigramSurprisal(docs, joinStrategy)
      .select(col("doc_id"),
        expr(s"cast(shiftleft(bigram_bits, $scaleBits) div n_pairs as bigint)")
          .as("ppl_scaled"), col("n_pairs"))
    // boundedValues: the integerized rate concentrates — 666 distinct
    // ppl_scaled values at sf0.1, 770 at 10× (measured r15) — so the
    // value-count relation is cardinality-bounded and the cheap prefix
    // applies.
    GlobalRank.ntileByValue(scored, buckets, col("ppl_scaled"), col("doc_id"),
        "bucket", boundedValues = true)
      .select(col("doc_id"), col("n_pairs"), col("ppl_scaled"), col("bucket"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed-bigram features are under a TARGET
    * distribution than under the raw corpus — the importance-resampling
    * signal used to pick pretraining data that looks like a trusted
    * high-quality set. The target here is the corpus slice with
    * `lang = targetLang` (a pipeline substitutes any curated target
    * relation); features are word bigrams hashed into `buckets` buckets
    * (the paper's hashed n-gram generative model).
    *
    * Integerized like the surprisal family: each bigram occurrence
    * contributes bits(n_target[bucket]) − bits(n_raw[bucket]) with
    * bits(x) = ⌊log2 x⌋ + 1 (the BIT LENGTH, so a count of 0 and a count
    * of 1 stay distinguishable — unlike the plain ⌊log2⌋ the surprisal
    * ops use on always-positive quotients), computed as
    * length(bin(2x)) − 1 so bits(0) = 0 without a CASE. The
    * log-likelihood-ratio proxy is bit-exact in any engine — positive
    * totals read "more target-like than corpus-average". Ratios/floats
    * never appear.
    *
    * Scale shape: bigram hashing AND the per-document bucket counts are
    * ROW-LOCAL — the codegen'd [[graft.functions.BigramBuckets]] kernel
    * digests each pair straight from the token bytes and collapses a
    * document's counts before anything explodes, so the exploded stream
    * is one row per distinct (doc, bucket), not per occurrence. The
    * bucket table is ONE map-side-combinable aggregate bounded by
    * `buckets` rows (both distributions counted in the same pass via a
    * filtered sum); the stream then BROADCAST-joins that tiny table — no
    * shuffle — and the per-doc sum partial-combines into the single
    * doc-keyed shuffle. The map-only feature lineage is computed once
    * per consumer rather than pinned behind a shared aggregate exchange:
    * A/B at the 10x slice (r11) reads 2.47 s without the shared exchange
    * vs 4.17 s with it — the kernel made the re-scan cheaper than
    * exchanging the corpus-sized (doc, bucket) relation (the r10
    * exchange-share won only against the per-occurrence composed-SQL
    * lineage, which cost 9.2 s here).
    *
    * Returns (doc_id, n_bigrams, dsir_bits).
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val feat = docs
      .select(col("doc_id"), col("lang"), words(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr(s"bigram_bucket_counts(toks, $buckets)")).as(Seq("b", "c")))
    val bucketBits = feat.groupBy(col("b"))
      .agg(
        sum(col("c")).as("n_raw"),
        sum(when(col("lang") === targetLang, col("c")).otherwise(lit(0L))).as("n_tgt"))
      .select(col("b"),
        (length(bin(col("n_tgt") * 2)) - 1).as("bits_tgt"),
        (length(bin(col("n_raw") * 2)) - 1).as("bits_raw"))
    feat.join(broadcast(bucketBits), "b")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        sum(col("c") * (col("bits_tgt") - col("bits_raw"))).cast("long").as("dsir_bits"))
  }

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

  /** Luhn-validated payment-card detection and masking — the checksum
    * step a real secrets-scrubbing pass adds on top of [[redact]]'s
    * digit-run heuristic: a 13–19-digit run is only a credible PAN if its
    * Luhn check digit verifies (ISO/IEC 7812), which cuts the false-mask
    * rate on ordinary long numbers by 90%. Candidates come from one
    * portable regex ([0-9]{13,19} — no lookarounds, so Java regex and
    * RE2 agree); validation is a ROW-LOCAL integer fold over the digits
    * (double every second digit from the right, subtract 9 above 9, sum
    * % 10 == 0); masking folds the VALID candidates into a replace chain.
    * Map-only: runs at scan speed, no shuffle at any corpus size.
    *
    * Returns (doc_id, n_candidates, n_valid, clean_text) with every
    * Luhn-valid run replaced by [PAN]; invalid runs are left in place
    * (they are account-number-shaped noise, [[redact]]'s business).
    */
  def luhnScan(docs: DataFrame): DataFrame = {
    val cands = "regexp_extract_all(text, '[0-9]{13,19}', 0)"
    def dbl(d: String) =
      s"CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END"
    val digit = "CAST(substring(c, i, 1) AS INT)"
    val luhnOk =
      s"""c -> aggregate(sequence(1, length(c)), 0,
         |  (a, i) -> a + CASE WHEN (length(c) - i) % 2 = 1
         |    THEN ${dbl(digit)} ELSE $digit END) % 10 = 0""".stripMargin
    docs.select(col("doc_id"),
      expr(s"size($cands)").cast("long").as("n_candidates"),
      expr(s"size(filter($cands, $luhnOk))").cast("long").as("n_valid"),
      expr(s"aggregate(filter($cands, $luhnOk), text, (t, c) -> replace(t, c, '[PAN]'))")
        .as("clean_text"))
  }

  /** Deterministic card-number fixture for [[luhnScan]] (the p47 pattern:
    * the corpus carries no digit runs, so the candidate bytes are
    * synthesized from row arithmetic that the oracle restates): docs with
    * doc_id % 5 == 0 stay untouched; the rest gain one 16-digit run whose
    * check digit is Luhn-CORRECT for even doc_ids and offset by 5
    * (always wrong) for odd ones.
    */
  def synthesizeCardText(docs: DataFrame): DataFrame = {
    val base = "lpad(cast(doc_id * 7919 % 1000000000000000 as string), 15, '0')"
    val digit = s"CAST(substring($base, i, 1) AS INT)"
    val dsum =
      s"""aggregate(sequence(1, 15), 0, (a, i) -> a + CASE WHEN (16 - i) % 2 = 1
         |  THEN CASE WHEN 2 * $digit > 9 THEN 2 * $digit - 9 ELSE 2 * $digit END
         |  ELSE $digit END)""".stripMargin
    val check =
      s"CASE WHEN doc_id % 2 = 0 THEN (10 - $dsum % 10) % 10 ELSE (15 - $dsum % 10) % 10 END"
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, col("text"))
        .otherwise(expr(s"concat(text, ' ', $base, cast($check as string))"))
        .as("text"))
  }

  /** Token-diversity (Gini impurity) per doc: 1 - Σ_w (c_w / n)².
    * A repetition signal like Shannon entropy but with NO transcendental
    * functions: Σ c_w² and n are exact integers, so the score is a single
    * IEEE division of two exact values — bit-reproducible on any engine
    * (ln differs in the last ulp across libm implementations, which is
    * why the entropy form can't be oracle-gated). Near 1 = diverse
    * vocabulary; near 0 = one token repeated. Two shuffles, both hash
    * aggregates: (doc, word) then doc — map-side combinable, no windows.
    */
  def giniDiversity(docs: DataFrame): DataFrame =
    withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct_tokens"),
        (lit(1.0) - col("sumsq").cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double")).as("gini"))

  /** BM25 relevance of every document against a fixed bag of query terms
    * (the retrieval / quality-filter scoring primitive). Corpus stats
    * (N, avgdl, per-term df) are ONE tiny aggregate collected to the
    * driver and folded into the row-local scoring plan as literals — the
    * corpus itself is never shuffled; scoring is map-only at scan speed.
    *
    * `rationalIdf = true` (default) replaces the standard
    * ln((N-df+0.5)/(df+0.5)) with the same rational argument un-logged.
    * It is order-equivalent (ln is monotone) and, unlike ln, involves
    * only +,-,/ — IEEE-exact on every engine, so scores can be
    * hash-compared across engines. Set false for textbook BM25 scores
    * when cross-engine bit-exactness doesn't matter.
    *
    * The per-term contributions are summed in query order as one fixed
    * scalar expression (t0 + t1 + ...), not an aggregate, so the double
    * additions happen in a defined order.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      rationalIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = withToks(docs)
    val dfAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df$i")
    }
    // Scala 2.13 rejects mixing fixed args with a `: _*` expansion in one
    // call, so the aggregate columns are hoisted into a single Seq.
    val aggCols = Seq(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl")) ++ dfAggs
    val stats = base
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()(0)
    val nDocs = stats.getAs[Long]("n_docs")
    require(nDocs > 0, "empty corpus")
    val avgdl = stats.getAs[Long]("sum_dl").toDouble / nDocs.toDouble
    val idfs = queryTerms.indices.map { i =>
      val dfT = stats.getAs[Long](s"df$i").toDouble
      val arg = (nDocs.toDouble - dfT + 0.5) / (dfT + 0.5)
      if (rationalIdf) arg else math.log(arg)
    }
    val dl = size(col("toks")).cast("double")
    val termScores = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), w => w === t)).cast("double")
      lit(idfs(i)) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }
    base.select(col("doc_id"), termScores.reduce(_ + _).as("bm25"))
      .filter(col("bm25") > 0.0)
  }

  /** Multi-query BM25 top-k retrieval — the inverted-index shape of
    * [[bm25]]: where bm25 folds ONE fixed term bag into row-local literal
    * expressions, this treats the query set as DATA (query_id, slot,
    * term), so a curation pipeline can score thousands of probe queries
    * in one pass (retrieval-based quality filtering, dataset search,
    * eval-set mining).
    *
    * Scale shape — TWO paths on one contract, picked by query-set size:
    *
    *  - FOLDED (total distinct terms <= [[Bm25FoldLimit]], the common
    *    retrieval-probe case and the benched one): per-term document
    *    frequencies and corpus stats come back from ONE 1-row
    *    conditional-count aggregate (bounded by the term count, which the
    *    caller supplied as literals — scale-safe to collect), and the
    *    per-(query, doc) SCORE is then a row-local literal-folded
    *    expression over the term_counts map — the postings LUT the r11
    *    verdict asked to broadcast, folded all the way into codegen. The
    *    per-(query, doc) relation never exists as exchanged data: the
    *    only thing that ever shuffles is the bounded-heap top-k partials
    *    (#partitions x k rows per query). Two corpus passes, both
    *    map-only.
    *
    *  - JOINED (huge query sets, where folding thousands of terms into
    *    one expression tree would blow up codegen): the query set stays
    *    DATA — the r11 shape: row-local term_counts posting slice,
    *    term-bounded dft aggregate broadcast back, conditional-MAX slot
    *    pivot, one per-(query, doc) exchange, bounded-heap top-k.
    *
    * Both paths produce bit-identical doubles: idf is the un-logged
    * rational from [[bm25]], contributions multiply/divide in the same
    * operand order, and per-query sums run in FIXED slot order (the
    * folded path adds its own terms left-to-right; the joined path's
    * conditional-MAX pivot then left-to-right + chain adds trailing
    * +0.0s for absent slots, which IEEE leaves bit-exact on these
    * strictly-positive contributions). Ties rank score-desc, doc_id-asc
    * — a total order.
    *
    * Queries must use distinct terms within a query. Returns
    * (query_id, doc_id, rnk, bm25).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.forall(q => q._2.distinct.size == q._2.size),
      "terms within a query must be distinct")
    val spark = docs.sparkSession
    import spark.implicits._
    // No queries / no terms: empty result with the output schema (the
    // pre-kernel broadcast-semi-join form's behavior), not an analysis
    // failure from an empty inlined term-array literal.
    if (queries.isEmpty || queries.forall(_._2.isEmpty))
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "doc_id", "rnk", "bm25")
    require(queries.forall(_._2.nonEmpty), "each query needs at least one term")
    if (queries.flatMap(_._2).distinct.size <= Bm25FoldLimit)
      bm25TopKFolded(docs, queries, k, k1, b)
    else bm25TopKJoined(docs, queries, k, k1, b)
  }

  /** Above this many distinct terms the folded score expression stops
    * being a codegen win (one when-chain per term per query) and the
    * data-driven joined path takes over.
    */
  private val Bm25FoldLimit = 256

  /** Folded path: postings statistics as literals, scores row-local,
    * nothing corpus-sized ever exchanges. See [[bm25TopK]].
    */
  private[ops] def bm25TopKFolded(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      k: Int, k1: Double, b: Double): DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    def sqlLit(t: String) = "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val allTerms = queries.flatMap(_._2).distinct
    val termList = allTerms.map(sqlLit).mkString(", ")
    val withM = withToks(docs)
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        expr(s"term_counts(toks, array($termList))").as("m"))
    // ONE corpus pass for n_docs, sum_dl AND every per-term document
    // frequency (conditional counts over the row-local posting map);
    // the result is one row, wide by the term count the caller wrote.
    val statCols = sum(col("dl")).as("sum_dl") +:
      allTerms.zipWithIndex.map { case (t, i) =>
        count(when(col("m").getItem(t).isNotNull, 1)).cast("long").as(s"df$i")
      }
    val stats = withM
      .agg(count(lit(1)).cast("long").as("n_docs"), statCols: _*)
      .collect()(0)
    val nDocs = stats.getAs[Long]("n_docs")
    // Empty corpus: the typed empty frame (the joined path's and the
    // pre-r12 behavior), not a construction-time exception.
    if (nDocs == 0) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Int, Double)]
        .toDF("query_id", "doc_id", "rnk", "bm25")
    }
    // Driver doubles reproduce the joined path's expression values
    // bit-for-bit: same operand order as the old contrib column.
    val avgdl = stats.getAs[Long]("sum_dl").toDouble / nDocs.toDouble
    val idf = allTerms.zipWithIndex.map { case (t, i) =>
      val dfT = stats.getAs[Long](s"df$i").toDouble
      t -> ((nDocs.toDouble - dfT + 0.5) / (dfT + 0.5))
    }.toMap
    val dlD = col("dl").cast("double")
    def scoreFor(ts: Seq[String]): Column = ts.map { t =>
      val tf = col("m").getItem(t).cast("double")
      when(tf.isNotNull,
        lit(idf(t)) * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / lit(avgdl))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    def presentFor(ts: Seq[String]): Column =
      ts.map(t => col("m").getItem(t).isNotNull).reduce(_ || _)
    val qStructs = queries.map { case (qid, ts) =>
      struct(lit(qid).as("query_id"), scoreFor(ts).as("bm25"),
        presentFor(ts).as("keep"))
    }
    withM
      .select(col("doc_id"), explode(array(qStructs: _*)).as("qs"))
      .filter(col("qs.keep"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"),
        col("qs.bm25").as("bm25"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topK(k)(col("bm25"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").as("doc_id"),
        (col("pos") + 1).cast("int").as("rnk"), col("col._1").as("bm25"))
  }

  /** Joined path for query sets too large to fold: the r11 shape — query
    * set as data, one per-(query, doc) exchange. See [[bm25TopK]].
    */
  private[ops] def bm25TopKJoined(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      k: Int, k1: Double, b: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxSlots = queries.map(_._2.size).max
    val qdf = queries
      .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (t, i) => (qid, i + 1, t) } }
      .toDF("query_id", "slot", "term")
    GraftFunctions.register(spark)
    val base = withToks(docs)
    def sqlLit(t: String) = "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val termList = queries.flatMap(_._2).distinct.map(sqlLit).mkString(", ")
    // term_counts computes the per-doc posting slice row-locally (hashed
    // set probe per token, codegen'd), so no per-token explode and no
    // (doc, term) count aggregate exist at all — (doc, term) is unique
    // by construction after the map explode.
    val posting = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(expr(s"term_counts(toks, array($termList))")).as(Seq("term", "tf")))
    val stats = base.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))
    val dft = posting.groupBy("term").agg(count(lit(1)).cast("long").as("dft"))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val tfD = col("tf").cast("double")
    val contrib =
      (nD - col("dft").cast("double") + lit(0.5)) / (col("dft").cast("double") + lit(0.5)) *
        tfD * lit(k1 + 1.0) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val perSlot = posting
      .join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qdf), Seq("term"))
      .select(col("query_id"), col("slot"), col("doc_id"), contrib.as("contrib"))
    val slotCols = (1 to maxSlots).map(s =>
      max(when(col("slot") === s, col("contrib"))).as(s"c$s"))
    val score = (1 to maxSlots)
      .map(s => coalesce(col(s"c$s"), lit(0.0)))
      .reduce(_ + _)
    perSlot
      .groupBy(col("query_id"), col("doc_id"))
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col("query_id"), col("doc_id"), score.as("bm25"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topK(k)(col("bm25"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col._2").as("doc_id"),
        (col("pos") + 1).cast("int").as("rnk"), col("col._1").as("bm25"))
  }

  /** Charset-class entropy — the encoding-noise / gibberish flag that
    * complements the Gopher/C4 word-level rules: character counts over
    * four classes (letters, digits, spaces, other) reduced to integer
    * surprisal bits, class_bits = Σ_c k_c * (floor-log2(n div k_c)) with
    * the same length(bin(n div k)) - 1 bit-length trick as the surprisal
    * family — integers end to end, map-only, no shuffle. Binary junk or
    * base64 blobs score high (classes mixed), clean prose scores low
    * (letters + spaces dominate). Returns (doc_id, n_chars_total,
    * class_bits) restricted to non-empty docs.
    */
  /** Gopher's duplicate-n-gram repetition rule (Rae et al. 2021 §A1.1:
    * "fraction of characters in duplicate n-grams" — the within-document
    * repetition filter the p76 battery's dominant-token rule
    * approximates but does not state), at n = 2: per document, how many
    * bigram OCCURRENCES belong to a bigram that repeats, and how many
    * BYTES those occurrences span. All integers — the keep verdict is
    * the cleared-denominator inequality dup_occ * 5 <= n_pairs
    * (duplicate-occurrence fraction <= 0.2, Gopher's 2-gram threshold)
    * — so any engine reproduces the flags bit-for-bit; byte counts
    * (octet_length / strlen) rather than character counts keep
    * multi-byte text engine-neutral.
    *
    * Scale shape: the codegen'd [[graft.functions.PairCounts]] kernel
    * collapses each document's pair multiset row-locally, so the
    * exploded stream is one row per DISTINCT (doc, pair) and the per-doc
    * sums partial-combine before the single doc-keyed exchange — the p80
    * stream shape without the corpus LM join. Returns (doc_id, n_pairs,
    * dup_pair_occ, dup_pair_bytes, ok_dup_pairs) for docs with >= 2
    * tokens.
    */
  def dupNgramStats(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    withToks(docs)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr("pair_counts(toks)")).as(Seq("pair", "c")))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_pairs"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).cast("long").as("dup_pair_occ"),
        sum(when(col("c") >= 2, col("c") * octet_length(col("pair")).cast("long"))
          .otherwise(0L)).cast("long").as("dup_pair_bytes"))
      .withColumn("ok_dup_pairs", col("dup_pair_occ") * 5 <= col("n_pairs"))
  }

  /** Per-document suffix statistics — the character-level repetition
    * card: `lrs_len` = longest substring occurring >= 2 times in the
    * document (overlaps count; the signal behind suffix-array dedup
    * thresholds, Lee et al. 2022's 50-char repeats), plus the k-gram
    * uniqueness pair (`distinct_k` DISTINCT length-k substrings over
    * `total_k` positions). Distinct from [[dupNgramStats]] (p115):
    * that measures how MUCH of the doc repeats at a fixed token n,
    * this measures how LONG the worst verbatim character repeat is at
    * any length, plus substring diversity at a fixed k.
    *
    * Scale shape: entirely ROW-LOCAL — one O(len) suffix-automaton pass
    * per document inside the codegen'd
    * [[graft.functions.SuffixStats]] kernel, no explode, no join, no
    * shuffle beyond the caller's. The oracle pays O(len * lrs) ladder
    * rows per document for the same numbers, so this card's cross-engine
    * gap WIDENS with scale in graft's favor by construction.
    * Returns (doc_id, lrs_len, distinct_k, total_k).
    */
  def suffixStats(docs: DataFrame, k: Int = 16): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"suffix_stats(text, $k)").as("ss"))
      .select(col("doc_id"), col("ss.lrs_len").as("lrs_len"),
        col("ss.distinct_k").as("distinct_k"), col("ss.total_k").as("total_k"))
  }

  def charsetEntropy(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    def kept(re: String) = (n - length(regexp_replace(col("text"), re, "")).cast("long"))
    val classes = docs.select(
      col("doc_id"), n.as("n"),
      kept("[A-Za-z]").as("k1"), kept("[0-9]").as("k2"), kept("[ ]").as("k3"))
      .withColumn("k4", col("n") - col("k1") - col("k2") - col("k3"))
      .filter(col("n") > 0)
    val bits = Seq("k1", "k2", "k3", "k4").map { k =>
      when(col(k) > 0, col(k) * (length(bin(expr(s"n div $k"))) - 1)).otherwise(0L)
    }.reduce(_ + _)
    classes.select(col("doc_id"), col("n").as("n_chars_total"),
      bits.cast("long").as("class_bits"))
  }

  /** Word-blocklist safety screen — the category-list filtering pass
    * (spam/adult/violence lists in real pipelines; neutral stand-in
    * categories here) that runs before any model-based safety scoring:
    * per document, occurrence counts per category plus a keep decision
    * (no category at or above its threshold). Row-local higher-order
    * functions over the token array — map-only, no shuffle; at 100 TB
    * the lists ride the closure (they are KB-sized by nature) and the
    * screen runs at scan speed.
    */
  def blocklistScreen(docs: DataFrame,
      categories: Seq[(String, Seq[String], Int)]): DataFrame = {
    require(categories.nonEmpty, "need at least one category")
    val base = withToks(docs)
    val catCols = categories.map { case (name, words, _) =>
      size(filter(col("toks"), w => w.isin(words: _*))).cast("long").as(s"n_$name")
    }
    val keep = categories.map { case (name, _, thr) => col(s"n_$name") < thr }
      .reduce(_ && _)
    base.select(col("doc_id") +: catCols: _*)
      .withColumn("keep", keep)
  }

  /** One BPE-style merge-candidate pass: corpus-wide counts of adjacent
    * CHARACTER pairs inside words, top `k` by count — the inner loop of
    * byte-pair-encoding tokenizer training (each training iteration merges
    * the top pair and recounts; this op is that counting step, exact).
    *
    * Scale shape: map-only pair explosion into ONE hash aggregate keyed
    * on the pair; the ranking window runs over the aggregated pair
    * relation, which is alphabet²-bounded (hundreds of rows at any corpus
    * size), so the single-partition window sort is metadata-sized.
    */
  def bpePairCounts(docs: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = withToks(docs)
      .select(explode(col("toks")).as("word"))
      .filter(length(col("word")) >= 2)
    words
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("pair"))).cast("int"))
      .filter(col("rk") <= k)
  }

  /** Feature-hashing linear classifier score — the execution shape of a
    * fastText-style quality filter: each token hashes into one of `dim`
    * weight buckets (the hashing trick, so the model is a fixed-size
    * array no matter the vocabulary), bucket weights are summed, and the
    * mean weight over tokens is the document score. The weights here are
    * a deterministic stand-in ((bucket % 13) - 6, integers in [-6, 6]) so
    * an independent engine replays the scores bit-for-bit; a trained
    * model swaps in a broadcast weight array without changing the plan.
    *
    * Scale shape: map-only — one projection over the scan, the token sum
    * is the codegen'd [[graft.functions.HashWeightSum]] kernel (one
    * digest per token over the raw bytes; the composed higher-order
    * `aggregate` ran its lambda frames interpreted with an md5-to-hex
    * string and a base-16 parse per token), no shuffle at any corpus
    * size. The integer weight sum is exact; the single final division is
    * one IEEE op, so scores are engine-reproducible.
    */
  def hashClassifierScore(docs: DataFrame, dim: Int = 1024): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val scored = withToks(docs).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      expr(s"hash_weight_sum(toks, $dim)").as("wsum"))
    val score = col("wsum").cast("double") / col("n_tokens").cast("double")
    scored.select(
      col("doc_id"), col("n_tokens"), col("wsum"),
      score.as("score"), (score > 0.0).as("keep"))
  }

  /** Intra-document repetition trim: split the doc into fixed 3-word
    * chunks (the same chunking as passage dedup) and keep only the FIRST
    * occurrence of each repeated chunk — the classic "remove repeated
    * paragraphs inside a page" curation step, where cross-doc passage
    * dedup ([[Dedup.passageDedup]]) handles boilerplate shared BETWEEN
    * docs. Emits per-doc counts plus an md5 of the trimmed text so the
    * reconstruction itself is oracle-checked, not just the arithmetic.
    *
    * Scale shape: chunking is row-local; first-occurrence selection is a
    * hash aggregate on (doc_id, chunk) keeping MIN(position) — linear in
    * chunk volume — and the trimmed text reassembles from the per-doc
    * first-occurrence list sorted by position (O(k log k) in the doc's
    * DISTINCT chunk count). A row-local `array_position` filter would be
    * O(chunks²) per document — a 1M-word doc is ~5e10 comparisons inside
    * one task — so the aggregate form is the one that survives long
    * documents; state never exceeds one document's distinct chunks.
    */
  def selfRepetitionTrim(docs: DataFrame, chunkWords: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(ws) / ${chunkWords}.0) AS INT) - 1),
           |  i -> array_join(slice(ws, i * $chunkWords + 1, $chunkWords), ' '))""".stripMargin))
        .as(Seq("pos", "chunk")))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(min(col("pos")).as("fpos"), count(lit(1)).as("n_occ"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("n_occ")).cast("long").as("n_chunks"),
        count(lit(1)).cast("long").as("n_kept"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(struct(fpos, chunk))), x -> x.chunk)"),
          " ")).as("trimmed_md5"))

  /** Multi-iteration BPE merge training — the full tokenizer-training
    * inner loop ([[bpePairCounts]] is one counting pass of it). Returns
    * the learned merge table: (step, p1, p2, cnt) for `nMerges` greedy
    * merges, each chosen by (count desc, pair asc) over the CURRENT
    * segmentation and applied left-to-right non-overlapping, exactly as
    * reference BPE does.
    *
    * Scale shape: the corpus collapses ONCE to the (word, freq) vocabulary
    * — corpus volume is paid a single time; every iteration then runs on
    * the vocabulary-sized relation. Per iteration: one hash aggregate for
    * weighted pair counts, a 1-row top-k to the driver (the chosen pair —
    * the only driver-side data), and a row-local fold that rewrites each
    * word's segmentation. `localCheckpoint` truncates the per-iteration
    * lineage so the job DAG stays flat across merges.
    */
  def bpeMerges(docs: DataFrame, nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    var seg = withToks(docs)
      .select(explode(col("toks")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("pieces"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      // Guard: a fully-merged word (one piece) has no adjacent pairs, and
      // sequence(1, 0) would DESCEND ([1, 0]) and index out of bounds.
      val top = seg
        .filter(size(col("pieces")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(pieces) - 1),
            |  i -> struct(element_at(pieces, i) AS p1, element_at(pieces, i + 1) AS p2))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p1"), col("p2"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val (p1, p2, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, p1, p2, cnt))
        // Left-to-right non-overlapping merge as a row-local fold: append
        // each piece, collapsing it into the previous one when the two
        // form the chosen pair (a just-merged token never re-merges —
        // concat changes it to p1||p2, matching reference BPE's scan).
        seg = seg.withColumn("pieces",
          aggregate(col("pieces"), array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(p1) && x === lit(p2),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
      }
    }
    merges.result().toDF("step", "p1", "p2", "cnt")
  }

  /** BPE ENCODE — the tokenizer-APPLY step that completes the BPE story
    * ([[bpePairCounts]] counts one pass, [[bpeMerges]] trains the merge
    * table, this tokenizes the corpus with it): every doc's words are
    * re-segmented by the trained merges in training order and the per-doc
    * token count reported — the number a token-budget mixer or sequence
    * packer actually consumes after tokenizer training.
    *
    * Scale shape: training collapses the corpus to the vocabulary once
    * ([[bpeMerges]]; the merge table itself is `nMerges` rows on the
    * driver); encoding is then ONE map-only pass with no shuffle — each
    * word is separator-framed (every piece as  piece , so a
    * literal replace of a framed pair is exactly BPE's left-to-right
    * non-overlapping merge scan, safe under adjacent repeats because a
    * match consumes BOTH frames and emits one), the M merges apply as M
    * chained codegen'd replaces, and the token count is the count of
    * piece terminators. Words keep all non-empty tokens (training's
    * length>=2 filter applies to LEARNING, not encoding; a single-char
    * word is one token).
    */
  def bpeEncode(docs: DataFrame, nMerges: Int = 3): DataFrame =
    encodeWithMerges(docs,
      bpeMerges(docs, nMerges).collect()
        .sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** BPE encode with a GIVEN merge table (training-order (p1, p2) pairs)
    * — how production tokenizer-apply actually runs: the tokenizer is
    * trained once, frozen, and applied to every later batch, so the
    * expensive [[bpeMerges]] pass amortizes across pipeline runs instead
    * of re-running per encode ([[bpeEncode]] composes the two for the
    * self-contained oracle form). Map-only, no shuffle, same framed
    * chained-replace plan as [[bpeEncode]].
    */
  def encodeWithMerges(docs: DataFrame, merges: Seq[(String, String)],
      keep: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val F = "\u001F" // unit separator: frames each piece start
    val E = "\u001E" // record separator: frames each piece end
    // The whole doc frames into ONE string (the codegen'd bpe_frame pass:
    // every non-space code point wrapped F..E, spaces kept as bare
    // separators) and each merge applies as a single LITERAL replace over
    // it — legal because a merge pattern needs its two framed pieces
    // ADJACENT (piece terminator immediately followed by the next frame
    // start), and across a word boundary a space sits between them, so no
    // pattern can span words; within a word it is exactly BPE's
    // left-to-right non-overlapping scan. One codegen'd StringReplace
    // pass per merge per DOC (no regex engine); bpe_frame replaced the
    // per-word transform(sequence..substr) framing — two array
    // allocations per word plus a UTF8String per character — that was the
    // measured hot path of tokenizer-apply at 10x corpus scale.
    def applyMerges(enc: Column): Column = merges.foldLeft(enc) {
      case (c, (p1, p2)) =>
        call_function("replace", c,
          lit(F + p1 + E + F + p2 + E), lit(F + p1 + p2 + E))
    }
    // Token count = occurrences of the piece terminator; translate drops
    // every U+001E so the length delta counts them (codegen'd, no split).
    def nPieces(enc: Column): Column =
      (length(enc) - length(translate(enc, E, ""))).cast("long")
    val toks = filter(words(lower(col("text"))), w => w =!= "")
    docs.select(
      col("doc_id") +:
        size(toks).cast("long").as("n_words") +:
        nPieces(applyMerges(expr("bpe_frame(lower(text))")))
          .as("n_tokens") +:
        keep.map(col): _*)
  }

  /** Per-language tokenizer fertility card — the multilingual-fairness
    * report a tokenizer release publishes: after training nMerges BPE
    * merges on the whole corpus, how many tokens does each language pay
    * per word and per character? All-integer totals (docs, words,
    * post-BPE tokens, non-space chars); the fertility and compression
    * RATIOS are left to the reader so no division can diverge across
    * engines — same contract as the corpus report.
    *
    * Scale shape: [[bpeMerges]] training (per merge: one vocab-sized
    * aggregate + a 1-row driver top-1), then ONE map-only encode pass
    * with lang/chars riding along, into one map-side-combinable
    * aggregate on the handful of language rows. No join: the per-doc
    * metadata never round-trips through a shuffle to meet its encoding.
    */
  def tokenizerFertility(docs: DataFrame, nMerges: Int = 3): DataFrame = {
    val merges = bpeMerges(docs, nMerges).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    encodeWithMerges(
      docs.withColumn("n_chars_ns",
        length(translate(col("text"), " ", "")).cast("long")),
      merges, keep = Seq("lang", "n_chars_ns"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(col("n_chars_ns")).cast("long").as("n_chars"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * char k-gram, then keep the MINIMUM hash of each w-window of
    * consecutive positions — the guarantee is that any match of length
    * >= w + k - 1 between two documents shares at least one selected
    * fingerprint, at ~1/w the storage of full shingling. The whole-doc
    * fingerprint ([[fingerprints]]) breaks on a single edit; winnowed
    * fingerprints localize it. Selection here is value-level (the set
    * of window minima), which preserves the guarantee.
    *
    * Scale shape: entirely row-local — ONE codegen'd expression
    * ([[graft.functions.WinnowHashes]]: rolling polynomial k-gram hash +
    * monotonic-deque window minima, O(len) per doc) — then one explode;
    * no shuffle. Downstream dedup joins on (fp) are hash-partitioned and
    * linear in fingerprint volume. The hash is the [[graft.functions
    * .RollingHash]] polynomial, reproducible externally as
    * sum(cp_j * 31^(len-j)) mod 1e9+7 over each gram's code points.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), explode(expr(s"winnow_hashes(text, $k, $w)")).as("fp"))
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
