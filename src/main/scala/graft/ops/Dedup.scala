package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora, each shaped for
  * distributed execution: every variant reduces to hash-partitioned
  * shuffles on content-derived keys (no driver-side state, no cross-
  * partition broadcast of the corpus).
  *
  * - exact:        groupBy(md5(text)) — one shuffle on the content hash.
  * - n-gram Jaccard: shingle-explode + equi-join on shingle. Exact but
  *                 quadratic in the worst case; the scale path is MinHash.
  * - MinHash+LSH:  shingle -> per-seed min-hash signature -> banded
  *                 bucket join. Candidate generation is linear in corpus
  *                 size; only same-bucket pairs are compared.
  * - SimHash:      32-bit signature from per-word hashes; near-dup pairs by
  *                 hamming distance, or banded for scale.
  * - embedding:    cosine over `Array[Float]` vectors (see Similarity for
  *                 the ANN scale path).
  *
  * All hashes are md5-derived so an external SQL oracle can reproduce them.
  */
object Dedup {

  private def words(text: Column): Column = split(text, " ")

  /** doc_id -> word n-gram shingles ("a b c" strings). `distinct` costs a
    * shuffle — required for set-semantics consumers (Jaccard counts), but
    * droppable for MIN-based consumers (minhash), where duplicates cannot
    * change the aggregate. Shingling runs through the codegen'd
    * [[graft.functions.NgramShingles]] expression (one pass, no
    * interpreted lambdas); `explode` of its empty array drops short docs
    * exactly like the previous size-filtered form.
    */
  def shingles(docs: DataFrame, n: Int = 3, distinct: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(
      col("doc_id"),
      explode(expr(s"ngram_shingles(text, $n)")).as("shingle"))
    if (distinct) sh.distinct() else sh
  }

  /** Exact duplicate groups: content hash -> surviving id + group size. */
  def exactStats(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Ids that survive exact dedup (first id per content hash). A plain
    * hash aggregate (map-side combinable) — the row_number-window form
    * would add a full shuffle-sort for the same MIN semantics.
    */
  def exactKeep(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  /** Near-duplicate pairs by exact n-gram Jaccard >= threshold, with
    * PPJoin-style prefix filtering for candidate generation:
    *
    * If jaccard(A,B) >= t then |A∩B| >= t*|A∪B| >= t*|A|, so A and B must
    * share an element within the first `|A| - ceil(t*|A|) + 1` shingles
    * under ANY consistent global order. Ordering shingles rarest-first
    * (ascending document frequency) keeps the inverted index nearly
    * fan-out-free, so the candidate join is tiny even on a corpus whose
    * vocabulary is heavily shared. Verification then counts exact
    * intersections over candidates only — the result set (and hence the
    * oracle) is identical to the all-pairs formulation.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame =
    jaccardPairsFromDocData(jaccardDocData(docs, n, threshold), threshold)

  /** The per-document PPJoin state relation: (doc_id, set, n_sh, prefix)
    * with `set` the doc's DISTINCT shingles sorted rarest-first. Split
    * out of [[ngramJaccardPairs]] (r18) so [[lshTuningCard]] can persist
    * it ONCE and derive both its pair lineages from the same shingle
    * pass; composing the two halves reproduces the r17 plan exactly.
    *
    * PPJoin, collapsed to per-document state: ONE hash aggregate builds the
    * rarity-sorted shingle array per doc ((df, shingle) is a consistent
    * global total order), the PPJoin prefix is a row-local slice of it, and
    * exact verification is a row-local array_intersect over the candidate
    * pair's sets. Compared to the window-sort + exploded-index-double-join
    * formulation this removes the per-doc shuffle-sort and both wide
    * verification shuffles; only the tiny (doc_id, set, prefix) relation —
    * one row per doc, not per shingle — flows into the joins, so the plan
    * holds at corpus scale where the exploded index dwarfs memory.
    *
    * No persist here: in [[ngramJaccardPairs]] `docData` feeds four plan
    * branches (both self-join sides and both verification lookups), but
    * they share the identical aggregate subtree, so ReuseExchange
    * materializes its shuffle ONCE and the branches re-read the shuffle
    * files — the caching persist() used to provide, without
    * block-manager state outliving the query (a long-lived gateway
    * session would otherwise accumulate cached blocks across requests).
    * The explicit isnotnull(doc_id) matches the filter the optimizer
    * infers on the candidate/verify branches from their doc_id joins —
    * without it the df branch below lacks that filter, the subtrees no
    * longer canonicalize together, and the shingle explode runs twice
    * (r17: one scan+explode, exchange reused). doc_id is the fixture PK,
    * so no row is dropped.
    */
  private[ops] def jaccardDocData(docs: DataFrame, n: Int,
      threshold: Double): DataFrame = {
    val ex = shingles(docs.filter(col("doc_id").isNotNull), n, distinct = true)
    val df = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    ex
      .join(df, "shingle")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("arr"))
      .select(col("doc_id"), expr("transform(arr, x -> x.shingle)").as("set"))
      .withColumn("n_sh", size(col("set")).cast("long"))
      // Prefix length |A| - ceil(t*|A|) + 1: two docs with jaccard >= t must
      // share a shingle within each other's prefix under the global order.
      // The 1e-9 slack inside ceil keeps float rounding from pushing the
      // product just above the exact integer (which would shorten the
      // prefix and silently drop a true pair) — like the candidate-join
      // bounds, rounding here may only ADMIT candidates.
      .withColumn("prefix", expr(
        s"slice(set, 1, cast(size(set) - ceil(size(set) * $threshold - 1e-9) + 1 as int))"))
  }

  /** Candidate generation + exact verification over a
    * [[jaccardDocData]]-shaped relation (persisted or not — all four
    * consumers reference the SAME DataFrame, so a cached input is read
    * from the cache and an uncached one shares its exchange). */
  private[ops] def jaccardPairsFromDocData(docData: DataFrame,
      threshold: Double): DataFrame = {
    // Candidate generation: equi-join on prefix shingles, pruned row-locally
    // by (a) the length bound — jac >= t forces t*|A| <= |B| <= |A|/t — and
    // (b) PPJoin's positional bound: a pair matching at (sorted) positions
    // pa/pb can intersect in at most 1 + min(|A|-pa-1, |B|-pb-1) elements,
    // which must reach the required overlap t/(1+t)*(|A|+|B|). Both filters
    // carry a 1e-9 slack so float rounding can only ADMIT a candidate (the
    // exact verification below decides), never drop a true pair.
    val pre = docData.select(
      col("doc_id"), col("n_sh"),
      posexplode(col("prefix")).as(Seq("p", "shingle")))
    val candidates = pre.as("a")
      .join(pre.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") * threshold <= col("b.n_sh") + lit(1e-9) &&
          col("b.n_sh") * threshold <= col("a.n_sh") + lit(1e-9) &&
          (lit(1.0) + least(col("a.n_sh") - col("a.p") - 1, col("b.n_sh") - col("b.p") - 1)) * (1.0 + threshold)
            >= (col("a.n_sh") + col("b.n_sh")) * threshold - lit(1e-9))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    // Exact verification: both sets are distinct arrays, so
    // size(array_intersect) is the exact intersection cardinality.
    candidates
      .join(docData.select(
        col("doc_id").as("i"), col("n_sh").as("na"), col("set").as("sa")), "i")
      .join(docData.select(
        col("doc_id").as("j"), col("n_sh").as("nb"), col("set").as("sb")), "j")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("i"), col("j"), col("jac"))
  }

  /** (doc_id, band) derived ROW-LOCALLY from a per-doc distinct shingle
    * array — no shingle explode, no signature shuffle. Signatures are
    * identical to [[minhashSignature]]'s KM family: min(h1 + s*h2) over a
    * doc's shingle MULTISET equals the min over its distinct set (the
    * [[incrementalKeep]] construction, shared here for [[lshTuningCard]]).
    * `sets` must expose (doc_id, set) with at least one shingle per row —
    * exactly what [[jaccardDocData]] produces (short docs drop at the
    * explode on both the exploded and the set-derived paths).
    */
  private def bandedFromSets(sets: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val hp = transform(
      transform(col("set"), x => md5(x)),
      d => struct(
        conv(d.substr(lit(1), lit(14)), 16, 10).cast("long").as("h1"),
        conv(d.substr(lit(17), lit(14)), 16, 10).cast("long").as("h2")))
    val sig = (0 until numHashes).map(seed =>
      array_min(transform(col("hp"),
        p => p.getField("h1") + lit(seed.toLong) * p.getField("h2"))).as(s"h$seed"))
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(k => col(s"h${b * rowsPerBand + k}").as(s"v$k"))
      struct((lit(b).as("b") +: parts): _*)
    }
    sets.select(col("doc_id"), hp.as("hp"))
      .select((col("doc_id") +: sig): _*)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
  }

  /** Directional containment near-dup pairs: c(i→j) = |S_i ∩ S_j| / |S_i|
    * over n-gram shingle sets. Catches SUBSET duplication that symmetric
    * Jaccard misses — a short doc fully quoted inside a long one scores
    * c≈1 while its Jaccard is tiny. Emits (i, j, contain) for ordered
    * pairs i≠j with c(i→j) >= threshold.
    *
    * Execution shape: per-doc distinct shingle sets in one hash
    * aggregate, intersection counts via an equi-join on the shingle
    * (hash-partitioned, linear in total shingle volume), then a row-local
    * division. Exact baseline — worst case quadratic in docs sharing a
    * shingle, like [[ngramJaccardPairs]]' verification stage; at corpus
    * scale, block first with [[minhashLshCandidates]] and verify
    * containment only on candidates. No prefix filter applies here: the
    * contained side gives no length bound (c(i→j) ignores |S_j|).
    */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.9): DataFrame = {
    // One aggregate builds the per-doc distinct set AND its cardinality;
    // the explode then carries n_sh alongside each shingle, so the
    // division needs no separate count aggregate or post-join lookup —
    // two shuffles fewer than the count-then-join form, and the set size
    // rides the (already-shuffled) shingle rows for free.
    val sets = shingles(docs, n, distinct = false)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("shingle")).as("set"))
      .select(col("doc_id"), size(col("set")).cast("long").as("n_sh"),
        explode(col("set")).as("shingle"))
    sets.as("a")
      .join(sets.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"), col("a.n_sh").as("n_sh"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("contain", col("inter").cast("double") / col("n_sh").cast("double"))
      .filter(col("contain") >= threshold)
      .select(col("i"), col("j"), col("contain"))
  }

  /** MinHash signature via the two-hash (Kirsch-Mitzenmacher) family:
    * one md5 per shingle yields h1/h2 (two 56-bit ints from the hex
    * digest); hash s is `h1 + s * h2`, and the signature is the per-seed
    * MIN. One digest per shingle instead of `numHashes` — the md5 cost
    * dominates signature building at corpus scale. All arithmetic stays
    * in int64 (s*h2 <= 7 * 2^56), so any engine reproduces it exactly.
    */
  def minhashSignature(docs: DataFrame, numHashes: Int = 8, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n, distinct = false)
      .withColumn("d", md5(col("shingle")))
      .withColumn("h1", conv(substring(col("d"), 1, 14), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("d"), 17, 14), 16, 10).cast("long"))
    val aggs = (0 until numHashes)
      .map(s => min(col("h1") + lit(s.toLong) * col("h2")).as(s"h$s"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded `bands` ways; docs sharing any
    * band bucket are candidates. Join key is (band index, band value) — a
    * plain hash-partitioned equi-join, linear in corpus size.
    */
  /** (doc_id, band) relation: the doc's signature split into `bands`
    * bucket keys. The band value is ONLY a join key — a native struct of
    * the band's min-hash longs rather than a concat_ws string (no per-row
    * string building/hashing; candidate pairs identical either way).
    */
  private def bandedSignature(
      docs: DataFrame, numHashes: Int, bands: Int, n: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignature(docs, numHashes, n)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(k => col(s"h${b * rowsPerBand + k}").as(s"v$k"))
      struct((lit(b).as("b") +: parts): _*)
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
  }

  def minhashLshCandidates(
      docs: DataFrame, numHashes: Int = 8, bands: Int = 4, n: Int = 3): DataFrame = {
    val banded = bandedSignature(docs, numHashes, bands, n)
    banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
  }

  /** INCREMENTAL dedup — the production shape: a new crawl batch is
    * deduplicated against the ALREADY-CURATED corpus without touching the
    * corpus itself. Per incoming doc: LSH-banded candidates against (a)
    * the existing corpus and (b) smaller-id incoming docs, each verified
    * by exact n-gram Jaccard >= threshold; the doc is kept iff it has no
    * verified duplicate in either set (the non-recursive min-id-keeps
    * rule every batch operator here uses). Emits EVERY incoming doc with
    * its duplicate counts and the keep verdict, so the drop reasons are
    * auditable.
    *
    * Scale shape: the existing side contributes only its banded signature
    * relation and its shingle sets for candidate verification — exactly
    * the two relations a production pipeline PERSISTS alongside the
    * corpus (recomputed here for self-containment); the incoming side is
    * batch-sized. Candidate joins are hash-partitioned equi-joins on the
    * band key; verification is row-local array_intersect over candidate
    * pairs only. Pairs naturally with incremental Iceberg reads: the
    * incoming frame is an `iceberg_changes` snapshot diff.
    */
  def incrementalKeep(existing: DataFrame, incoming: DataFrame,
      numHashes: Int = 8, bands: Int = 4, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    // Each side's shingle sets are built in ONE aggregate and the KM
    // minhash signature then derives ROW-LOCALLY from the set array (md5
    // once per shingle into (h1, h2), then a per-seed array_min) — the
    // separate exploded-shingle signature pass of [[minhashSignature]],
    // a second full shingle scan + 8-way min shuffle per side, never
    // runs. Signatures are identical: min(h1 + s*h2) over the shingle
    // multiset equals the min over its distinct set.
    def sets(d: DataFrame): DataFrame =
      shingles(d, n, distinct = false)
        .groupBy(col("doc_id"))
        .agg(collect_set(col("shingle")).as("set"))
        .select(col("doc_id"), col("set"),
          size(col("set")).cast("long").as("n_sh"))
    val rowsPerBand = numHashes / bands
    def banded(s: DataFrame): DataFrame = {
      val hp = transform(
        transform(col("set"), x => md5(x)),
        d => struct(
          conv(d.substr(lit(1), lit(14)), 16, 10).cast("long").as("h1"),
          conv(d.substr(lit(17), lit(14)), 16, 10).cast("long").as("h2")))
      val withHp = s.select(col("doc_id"), hp.as("hp"))
      val sig = (0 until numHashes).map(seed =>
        array_min(transform(col("hp"),
          p => p.getField("h1") + lit(seed.toLong) * p.getField("h2"))).as(s"h$seed"))
      val bandCols = (0 until bands).map { b =>
        val parts = (0 until rowsPerBand)
          .map(k => col(s"h${b * rowsPerBand + k}").as(s"v$k"))
        struct((lit(b).as("b") +: parts): _*)
      }
      withHp.select((col("doc_id") +: sig): _*)
        .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
    }
    val exSets = sets(existing)
    val incSets = sets(incoming)
    val exBand = banded(exSets).select(col("doc_id").as("j"), col("band"))
    val incBand = banded(incSets)
    val candEx = incBand.select(col("doc_id").as("i"), col("band"))
      .join(exBand, "band").select(col("i"), col("j")).distinct()
    val candIn = incBand.as("x")
      .join(incBand.as("y"), col("x.band") === col("y.band") &&
        col("y.doc_id") < col("x.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j")).distinct()
    // BOTH candidate families verify in ONE pass: candidates union with a
    // side tag, the i-side set array joins once (not once per family),
    // the j side comes from the side-tagged union of both set relations,
    // and one aggregate splits the verified counts back out by tag. The
    // verification joins ship the per-doc shingle arrays — the wide
    // payload here — exactly half as often as the per-family form.
    val candAll = candEx.withColumn("side", lit("ex"))
      .unionByName(candIn.withColumn("side", lit("in")))
    val rightSets = exSets.withColumn("side", lit("ex"))
      .unionByName(incSets.withColumn("side", lit("in")))
    val counts = candAll
      .join(incSets.select(
        col("doc_id").as("i"), col("set").as("sa"), col("n_sh").as("na")), "i")
      .join(rightSets.select(
        col("side"), col("doc_id").as("j"),
        col("set").as("sb"), col("n_sh").as("nb")), Seq("side", "j"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")).cast("double") >= threshold)
      .groupBy(col("i").as("doc_id"))
      .agg(
        sum(when(col("side") === "ex", 1L).otherwise(0L)).as("he"),
        sum(when(col("side") === "in", 1L).otherwise(0L)).as("hi"))
    incoming.select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("he"), lit(0L)).as("n_dup_existing"),
        coalesce(col("hi"), lit(0L)).as("n_dup_prior"),
        (coalesce(col("he"), lit(0L)) === 0 &&
          coalesce(col("hi"), lit(0L)) === 0).as("keep"))
  }

  /** 32-bit SimHash from per-word 32-bit hashes (md5-hex prefix -> int).
    * Partial-aggregable: the per-bit sign sums combine associatively, so
    * Spark's map-side combine applies.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val wh = docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long").as("h"))
    val bitAggs = (0 until 32).map { b =>
      sum(when(expr(s"(h div ${1L << b}) % 2") === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sums = wh.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 32)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), sim.cast("long").as("simhash"))
  }

  /** Near-duplicate pairs by SimHash hamming distance <= maxDist — exact
    * for ANY maxDist. For maxDist <= 7 it runs candidate->verify with NO
    * cross join; wider radii (where no 8-bit pigeonhole bound exists)
    * fall back to the all-pairs verification form, which is exact but
    * quadratic — at those radii nearly every pair matches anyway, so
    * candidate generation cannot help.
    *
    * Candidate generation is pigeonhole-exact on 8-bit chunks: with 4
    * chunks, a pair within total distance 7 must have SOME chunk pair
    * within distance 1 (all four >= 2 would sum to >= 8). So one join
    * side expands each chunk value to itself plus its 8 single-bit
    * flips; an equi-join on (chunk index, value) then finds every
    * qualifying pair, and `bit_count` on the joined signatures verifies
    * the exact distance. Output is identical to the all-pairs
    * formulation (the oracle states that form directly).
    *
    * Why not narrower bands: a plain (maxDist+1)-band pigeonhole needs
    * 4-5-bit bands for maxDist=6, and simhash bits are corpus-biased
    * (docs sharing a vocabulary push every bit the same way), so those
    * buckets collapse into near-corpus-sized groups — measured at 8.3 s
    * vs 1.8 s for the cross join at sf0.1. 8-bit chunks keep 256-way
    * spread per chunk index; the 9x variant fan-out lives on one side
    * only and the join stays a hash-partitioned equi-join, linear-ish in
    * corpus size instead of quadratic.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 6): DataFrame = {
    if (maxDist > 7) {
      // Pigeonhole d<=1-per-chunk coverage holds only for maxDist <= 7
      // (four chunks all at distance >= 2 sum to >= 8). Beyond it, keep
      // the exact contract via the all-pairs baseline — but guard it like
      // Similarity.nearDupPairs: 32-bit signatures of random docs average
      // distance ~16, so radii 8..12 are still selective and a quadratic
      // join at corpus scale would be an accident, not a choice.
      val probed = docs.limit(100001).count()
      require(probed <= 100000L,
        s"simhashPairs(maxDist=$maxDist) falls back to the exact all-pairs " +
          "join (no pigeonhole band covers radii > 7); corpus exceeds the " +
          "100k-row verification cap — block with simhashBandedCandidates " +
          "and verify candidates, accepting banding recall.")
      val sig = simhash(docs)
      return sig.as("a")
        .join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          expr("bit_count(a.simhash ^ b.simhash)").as("dist"))
        .filter(col("dist") <= maxDist)
    }
    val sig = simhash(docs)
    // Exact side: 4 rows per doc — (chunk index, chunk value). Both sides
    // carry the full signature so verification happens IN the join row
    // (one bit_count + filter) — no candidate materialization and no
    // signature-lookup joins. Per chunk index at most one of a doc's 9
    // variants can equal the other doc's exact chunk value, so a pair
    // appears at most once per chunk index; the first-qualifying-chunk
    // condition below then makes the join output itself duplicate-free.
    val chunkCols = (0 until 4).map(c =>
      struct(lit(c).as("c"), expr(s"(simhash div ${1L << (8 * c)}) % 256").as("v")))
    val exact = sig
      .select(col("doc_id"), col("simhash"), explode(array(chunkCols: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    // Expanded side: 36 rows per doc — each chunk value plus its 8
    // single-bit flips (distance <= 1 neighborhood of the 8-bit value).
    val variantCols = (0 until 4).flatMap { c =>
      val base = expr(s"(simhash div ${1L << (8 * c)}) % 256")
      struct(lit(c).as("c"), base.as("v")) +:
        (0 until 8).map(bit =>
          struct(lit(c).as("c"),
            expr(s"(simhash div ${1L << (8 * c)}) % 256 ^ ${1 << bit}").as("v")))
    }
    val expanded = sig
      .select(col("doc_id"), col("simhash"), explode(array(variantCols: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    // Each qualifying pair can match on up to 4 chunk indexes (one row
    // per index) — instead of shuffling the qualified rows through a
    // distinct, emit ONLY the row whose chunk index is the FIRST with
    // chunk-distance <= 1: three row-local bit_counts replace a whole
    // dedup exchange, and the output is exactly one row per pair.
    val chunkDist = (c: Int) =>
      expr(s"bit_count(((a.simhash ^ b.simhash) div ${1L << (8 * c)}) % 256)")
    val firstQualifyingChunk =
      col("a.c") === 0 ||
        (chunkDist(0) >= 2 && (col("a.c") === 1 ||
          (chunkDist(1) >= 2 && (col("a.c") === 2 || chunkDist(2) >= 2))))
    expanded.as("a")
      .join(exact.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id") && firstQualifyingChunk)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.simhash ^ b.simhash)").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Near-dup pairs with EDIT-DISTANCE verification: MinHash LSH proposes
    * candidates (banded equi-join, linear in corpus size) and
    * `levenshtein` over a bounded prefix verifies each pair exactly.
    * Complements set-overlap verification ([[ngramJaccardPairs]]): edit
    * distance respects token ORDER, so a reshuffled bag of words that
    * scores Jaccard 1.0 still fails here — the right verifier for
    * boilerplate whose wording, not vocabulary, repeats.
    *
    * Scale shape: the banded O(prefixLen * maxDist) DP (the threshold
    * form of `levenshtein` early-exits and prunes cells more than
    * maxDist off-diagonal) runs once per CANDIDATE (LSH-bounded), never
    * per cross pair; the prefix cap keeps the per-row cost constant
    * regardless of document length. Both joins hash-partition on doc id
    * — candidate count, not corpus size, is the only quadratic-ish
    * term, and banding controls it. Distances the threshold prunes come
    * back as -1, so the keep-filter is dist IN [0, maxDist]; kept
    * pairs' distances are exactly the unbounded DP's values.
    *
    * Cross-engine caveat: Spark's `levenshtein` edits CODEPOINTS while
    * DuckDB's edits BYTES, so the p55 oracle parity holds only for
    * ASCII text (the corpus here). On multibyte text the distances (and
    * therefore the maxDist cut) diverge between the engines — pick one
    * semantics and one engine for non-ASCII corpora, or normalize first.
    */
  def editDistancePairs(docs: DataFrame, maxDist: Int = 40,
      prefixLen: Int = 200): DataFrame = {
    val txt = docs.select(col("doc_id"), substring(col("text"), 1, prefixLen).as("pfx"))
    minhashLshCandidates(docs)
      .join(txt.select(col("doc_id").as("i"), col("pfx").as("pa")), "i")
      .join(txt.select(col("doc_id").as("j"), col("pfx").as("pb")), "j")
      .select(col("i"), col("j"),
        levenshtein(col("pa"), col("pb"), maxDist).cast("int").as("dist"))
      .filter(col("dist").between(0, maxDist))
  }

  /** Scale path for SimHash: split the 32-bit signature into 4 x 8-bit
    * chunks; any pair within hamming distance 3 shares at least one exact
    * chunk (pigeonhole), so an equi-join per chunk finds all candidates
    * without the quadratic cross join.
    */
  def simhashBandedCandidates(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sig = simhash(docs)
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("c"), expr(s"(simhash div ${1L << (8 * c)}) % 256").as("v")))
    val banded = sig
      .select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    banded.as("a")
      .join(banded.as("b"), col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.simhash ^ b.simhash)").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Cross-document EXACT substring sharing via winnowing anchors — the
    * train-set-dedup flavor that targets verbatim spans (licenses, quoted
    * passages, memorized benchmark items) rather than whole-document
    * similarity: suffix-array exact-substring dedup re-expressed in the
    * candidate→verify shape every other near-dup path here uses.
    *
    * Per doc, [[graft.functions.WinnowAnchors]] selects one char-k-gram
    * anchor per w-window in ONE codegen'd O(len) pass (the winnowing
    * guarantee: ANY shared run of >= w+k-1 chars puts the same k-gram
    * hash in both docs' anchor sets, at ~1/w the rows of full per-position
    * shingling). Anchors whose hash lands in 2..maxDf distinct docs are
    * joined on (hash, gram) — the gram is the k literal chars cut out at
    * anchor time, so verification is exact CHARACTER equality riding the
    * join key and no document text ever ships. The df cap is the MOSS
    * "drop over-common fingerprints" rule: it bounds per-hash fan-out to
    * maxDf docs (<= maxDf^2 pairs per hash) and throws away boilerplate
    * grams that say nothing about pairwise duplication.
    *
    * Scale shape: the winnowed-anchor pass runs twice — once to learn the
    * df cap (shuffling only 16 B/row), once to pair; the shared-exchange
    * single-pass form was A/B-measured slower and wider (see the rare
    * branch below) — then one (hash, gram) aggregate collecting the
    * <= maxDf matching doc ids, ROW-LOCAL pair expansion (<= C(maxDf, 2)
    * structs per anchor — no self-join, so nothing broadcasts or
    * shuffles the anchor relation whole), one partial-combinable
    * count-distinct per pair. Every stage is corpus- or candidate-linear.
    *
    * Returns (doc_a, doc_b, n_anchors): pairs sharing >= minAnchors
    * distinct verified anchor hashes, i.e. at least that many distinct
    * exact k-char runs in common.
    */
  def exactSubstringPairs(docs: DataFrame, k: Int = 20, w: Int = 8,
      maxDf: Int = 10, minAnchors: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val anchors = docs
      .select(col("doc_id"), col("text"),
        explode(expr(s"winnow_anchors(text, $k, $w)")).as("packed"))
      .select(col("doc_id"),
        expr("shiftright(packed, 32)").as("hash"),
        // packed % 2^32 is the 1-based gram position; cut the k literal
        // chars here so the verify payload is k chars, not the document.
        expr(s"substring(text, cast(packed % 4294967296 as int), $k)").as("gram"))
      .distinct()
    // Deliberately a SECOND winnow pass, not a reuse of the pairing
    // branch's (doc_id, hash, gram) exchange: this branch shuffles 16
    // bytes/row after map-side distinct, while the shared-exchange form
    // (r17 A/B, live count(gram)/sum(pos) pins) re-reads the 40+ B/row
    // gram-carrying exchange and re-aggregates it through two extra
    // exchanges — measured +0.6 s/query at sf0.1 on BOTH 32 and 8 cores
    // with MORE bytes shuffled (13.2 -> 17.0 MB). The winnow kernel is
    // cheap; exchange serde is not.
    val rare = anchors
      .groupBy(col("hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2, maxDf))
      .select(col("hash"))
    anchors.join(rare, "hash")
      // Docs carrying the same verified gram, gathered once: the sorted
      // id array is df-capped, so expanding its ordered pairs row-locally
      // replaces the anchor self-join (which would rebuild the winnowed
      // corpus per side and broadcast or shuffle it whole).
      .groupBy(col("hash"), col("gram"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(col("hash"), explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a, b))))")).as("pr"))
      .groupBy(col("pr.a").as("doc_a"), col("pr.b").as("doc_b"))
      .agg(countDistinct(col("hash")).as("n_anchors"))
      .filter(col("n_anchors") >= minAnchors)
  }

  /** Maximal exact shared-span length per near-dup pair — the statistic a
    * verbatim-duplication report publishes (and a span-removal policy
    * consumes): for every [[exactSubstringPairs]]-style anchor pair, the
    * anchor is extended code point by code point in both directions until
    * the first mismatch, a text boundary, or `cap` code points per side
    * (the cap bounds per-row work, so two identical megadocuments cannot
    * stall a task — their span reports as k + 2·cap, which a consumer
    * reads as "at least"). Each doc contributes its MIN position per
    * (hash, gram) as the deterministic representative anchor; the pair's
    * span is the MAX extension over its shared anchors.
    *
    * Scale shape: [[exactSubstringPairs]]'s candidate machinery (two
    * winnow passes, df cap, row-local pair expansion) plus two doc_id
    * equi-joins that fetch the pair texts — candidate-bounded, the
    * standard fetch-for-verification stage — and ONE codegen'd O(cap)
    * [[graft.functions.CommonExtent]] call per (pair, anchor) row.
    * Returns (doc_a, doc_b, max_span, n_anchors).
    */
  def exactSubstringSpans(docs: DataFrame, k: Int = 20, w: Int = 8,
      maxDf: Int = 10, cap: Int = 60): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val anchors = docs
      .select(col("doc_id"), col("text"),
        explode(expr(s"winnow_anchors(text, $k, $w)")).as("packed"))
      .select(col("doc_id"),
        expr("shiftright(packed, 32)").as("hash"),
        expr("cast(packed % 4294967296 as bigint)").as("pos"),
        expr(s"substring(text, cast(packed % 4294967296 as int), $k)").as("gram"))
      .groupBy(col("doc_id"), col("hash"), col("gram"))
      .agg(min(col("pos")).as("pos"))
    // Deliberately a second winnow pass — see [[exactSubstringPairs]]'s
    // rare branch for the r17 A/B that rejected the shared-exchange form.
    val rare = anchors
      .groupBy(col("hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2, maxDf))
      .select(col("hash"))
    val pairAnchors = anchors.join(rare, "hash")
      .groupBy(col("hash"), col("gram"))
      .agg(sort_array(collect_set(struct(col("doc_id"), col("pos")))).as("ids"))
      .select(col("hash"), explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), " +
          "b -> named_struct('doc_a', a.doc_id, 'pa', a.pos, " +
          "'doc_b', b.doc_id, 'pb', b.pos))))")).as("pr"))
      .select(col("hash"), col("pr.doc_a"), col("pr.pa"), col("pr.doc_b"), col("pr.pb"))
    pairAnchors
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hash"),
        expr(s"common_extent(ta, pa, tb, pb, $k, $cap)").as("span"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("span")).as("max_span"),
        countDistinct(col("hash")).as("n_anchors"))
  }

  /** LSH tuning card — the evaluation artifact a dedup pipeline publishes
    * before trusting its banding parameters: MinHash-LSH candidate pairs
    * measured against the EXACT n-gram-Jaccard ground truth (PPJoin —
    * complete, not sampled). Four integer counts per configuration:
    * candidates generated, true pairs at the threshold, candidates that
    * verify (precision numerator), and true pairs the banding MISSED
    * (recall shortfall — the number that matters, since a missed pair is
    * a duplicate that survives dedup). Ratios left to the reader.
    *
    * Scale shape: both pair relations derive from ONE persisted
    * per-doc shingle-set pass ([[jaccardDocData]], r18) — the exact side
    * is p03's candidate→verify shape and the LSH side's signatures are
    * row-local over the cached sets; the card overlays them with ONE
    * full-outer equi-join on (i, j) and reads all four counts out of a
    * SINGLE multi-aggregate pass — each pair lineage executes exactly
    * once (the r13 four-separate-aggregate form re-traversed the shared
    * candidate relation per count, the corpus's worst load-amplification
    * case). Each (i, j) side is MATERIALIZED (persist + count) before
    * the overlay join: the two heavy candidate→verify lineages then run
    * as separate sequential jobs instead of co-scheduling inside one
    * plan — halving peak executor-memory pressure and isolating each
    * lineage's broadcast builds — and the overlay join consumes two
    * tiny cached (i, j) relations (bounded by pairs-at-threshold, KBs).
    * The persists ride [[CacheScope]], so a query driver that calls
    * `releaseCurrent()` frees them; lineage is retained (unlike a
    * checkpoint) so executor loss degrades to recompute, not failure.
    * CONSTRUCTION IS EAGER BY DESIGN — the two counts run here, so
    * building this DataFrame executes both pair lineages (seconds at
    * fixture scale, the corpus pair cost at production scale): the
    * sequencing IS the feature, unlike the construction-time probe the
    * surprisal family removed (that probe bought only a join hint; these
    * jobs are the query's own work, merely ordered). Plan-only callers
    * should introspect [[ngramJaccardPairs]]/[[minhashLshCandidates]]
    * directly, and every caller owns a `CacheScope.releaseCurrent()`
    * after its final action.
    * At true corpus scale the exact side is the expensive one — run the
    * card on a deterministic [[graft.ops.Sampling.hashSample]] slice,
    * exactly how production LSH tuning is done.
    */
  def lshTuningCard(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 8, bands: Int = 4): DataFrame = {
    // r18: ONE shingle pass serves BOTH sides. The exact side's
    // rarity-sorted per-doc set relation ([[jaccardDocData]]) is persisted
    // and the LSH side's KM signature derives ROW-LOCALLY from the cached
    // set array ([[bandedFromSets]] — md5 once per DISTINCT shingle,
    // per-seed array_min; the signature is provably the one
    // [[minhashLshCandidates]] computes, so the candidate set is
    // bit-identical). The minhash lineage's own corpus scan + shingle
    // explode + signature shuffle from r17 never run: one corpus pass
    // fewer at ANY scale, and the card's two sides can no longer disagree
    // on tokenization.
    val docData = CacheScope.persistTracked(jaccardDocData(docs, n, threshold))
    val exact = CacheScope.persistTracked(
      jaccardPairsFromDocData(docData, threshold).select(col("i"), col("j")))
    val banded = bandedFromSets(docData.select(col("doc_id"), col("set")),
      numHashes, bands)
    val cand = CacheScope.persistTracked(
      banded.as("x")
        .join(banded.as("y"), col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
        .distinct())
    // Sequential materialization (construction runs two jobs): the point
    // of the persists is isolation between the two heavy lineages, which
    // a lazy persist would not provide — the first action would still
    // execute both inside one job. The first count also materializes the
    // shared docData persist as part of its own lineage (no third job).
    exact.count()
    cand.count()
    // Both sides are distinct on (i, j), so the full outer join has one
    // row per pair in EITHER relation, with a side-marker null exactly
    // when that side lacks the pair — the four counts are then four
    // conditional COUNTs over one relation. count(when(...)) (not sum)
    // so an empty overlay still yields 0s, matching the old four-agg
    // form on an empty corpus.
    cand.withColumn("is_cand", lit(1))
      .join(exact.withColumn("is_true", lit(1)), Seq("i", "j"), "full_outer")
      .agg(
        count(col("is_cand")).cast("long").as("n_candidates"),
        count(col("is_true")).cast("long").as("n_true_pairs"),
        count(when(col("is_cand").isNotNull && col("is_true").isNotNull, lit(1)))
          .cast("long").as("n_verified"),
        count(when(col("is_true").isNotNull && col("is_cand").isNull, lit(1)))
          .cast("long").as("n_missed"))
  }

  /** Exact-substring EXCISION — the span-REMOVAL policy itself (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better":
    * when a long run is duplicated across documents, keep it once and cut
    * the other occurrences out of the text, rather than dropping whole
    * documents that are otherwise distinct). For every document that
    * appears as the LATER side (larger doc_id) of an exact-substring pair
    * whose maximal shared run reaches `minSpan` code points, the single
    * longest such run (ties: smallest start, then smallest source doc) is
    * cut from the text; the earlier document keeps its copy.
    *
    * Scale shape: [[exactSubstringSpans]]'s candidate machinery end to
    * end, with ONE [[graft.functions.CommonExtent]] call per (pair,
    * anchor) row in PACKED form (span * 2^32 + leftExt — position and
    * length from the same O(cap) scan, no second pass); the per-document
    * argmax is a plain MIN over an (invSpan, start, src) struct — map-side
    * combinable, no window — and the rewrite is one row-local substring
    * splice. The text rides the aggregate only for documents that have a
    * qualifying span at all.
    *
    * Returns (doc_id, src_doc, span_start, span, n_spans, clean_len,
    * clean_md5): the excised span's 1-based position and length, how many
    * qualifying (pair, anchor) spans the document had, and the
    * post-excision length + md5 (the text itself can be megabytes; a
    * pipeline applies the same splice where it owns the text column).
    */
  def excisedSpans(docs: DataFrame, k: Int = 20, w: Int = 8,
      maxDf: Int = 10, cap: Int = 60, minSpan: Int = 30): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val anchors = docs
      .select(col("doc_id"), col("text"),
        explode(expr(s"winnow_anchors(text, $k, $w)")).as("packed"))
      .select(col("doc_id"),
        expr("shiftright(packed, 32)").as("hash"),
        expr("cast(packed % 4294967296 as bigint)").as("pos"),
        expr(s"substring(text, cast(packed % 4294967296 as int), $k)").as("gram"))
      .groupBy(col("doc_id"), col("hash"), col("gram"))
      .agg(min(col("pos")).as("pos"))
    // Deliberately a second winnow pass — see [[exactSubstringPairs]]'s
    // rare branch for the r17 A/B that rejected the shared-exchange form.
    val rare = anchors
      .groupBy(col("hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd").between(2, maxDf))
      .select(col("hash"))
    val pairAnchors = anchors.join(rare, "hash")
      .groupBy(col("hash"), col("gram"))
      .agg(sort_array(collect_set(struct(col("doc_id"), col("pos")))).as("ids"))
      .select(col("hash"), explode(expr(
        "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), " +
          "b -> named_struct('doc_a', a.doc_id, 'pa', a.pos, " +
          "'doc_b', b.doc_id, 'pb', b.pos))))")).as("pr"))
      .select(col("pr.doc_a"), col("pr.pa"), col("pr.doc_b"), col("pr.pb"))
    val invBase = k + 2 * cap
    pairAnchors
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("tb"),
        expr(s"common_extent_packed(ta, pa, tb, pb, $k, $cap)").as("pk"),
        col("pb"))
      .select(col("doc_a"), col("doc_b"), col("tb"),
        expr("shiftright(pk, 32)").as("span"),
        (col("pb") - expr("pk % 4294967296")).as("start"))
      .filter(col("span") >= minSpan)
      .groupBy(col("doc_b"))
      .agg(
        min(struct((lit(invBase) - col("span")).as("inv"), col("start"),
          col("doc_a").as("src"), col("tb"))).as("best"),
        count(lit(1)).as("n_spans"))
      .select(
        col("doc_b").as("doc_id"),
        col("best.src").as("src_doc"),
        col("best.start").as("span_start"),
        (lit(invBase) - col("best.inv")).as("span"),
        col("n_spans"),
        (length(col("best.tb")) - (lit(invBase) - col("best.inv")))
          .cast("long").as("clean_len"),
        md5(concat(
          expr("substring(best.tb, 1, cast(best.start - 1 as int))"),
          expr(s"substring(best.tb, cast(best.start + ($invBase - best.inv) as int))")))
          .as("clean_md5"))
  }

  /** Canonical-form dedup — exact dedup after text normalization
    * (lowercase, strip non-alphanumerics, collapse whitespace): catches
    * the re-encoded/re-punctuated duplicates exact md5 dedup misses
    * while staying a pure hash-aggregate (no pair generation at all —
    * the cheap middle ground before shingle-based near-dup). Survivor is
    * min doc_id per canonical group, the family's rule. Returns
    * (doc_id, canon_md5, keep).
    *
    * Scale shape: normalization is row-local regex (codegen'd), then ONE
    * map-side-combinable min aggregate on the canonical hash joined back
    * by that hash — identical cost to exact dedup.
    */
  def canonicalDedup(docs: DataFrame): DataFrame = {
    val canon = md5(trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
    // The canon-keyed exchange is the share point for both consumers:
    // the min aggregate runs exchange-free on it and the keep join's
    // probe side reuses the same shuffle, so the normalization regex
    // runs ONCE over the corpus (r17; was one full regex pass per
    // branch). Both consumers reference both columns, so nothing prunes
    // the subtrees apart.
    // The isnotnull filter is stated INSIDE the shared subtree: the keep
    // join would infer it on its probe side only, splitting the two
    // consumers into separate regex passes. It drops exactly the rows the
    // inner join drops anyway (null keys never match), so results are
    // identical even on a corpus with null text.
    val withCanon = docs.select(col("doc_id"), canon.as("canon_md5"))
      .filter(col("canon_md5").isNotNull)
      .repartition(col("canon_md5"))
    val keepers = withCanon.groupBy(col("canon_md5"))
      .agg(min(col("doc_id")).as("__keep_id"))
    withCanon.join(keepers, "canon_md5")
      .select(col("doc_id"), col("canon_md5"),
        (col("doc_id") === col("__keep_id")).as("keep"))
  }

  /** URL-canonicalization dedup — group documents by their canonical URL
    * (the [[graft.functions.UrlCanonicalize]] kernel: fragment dropped,
    * scheme/host lowercased, `www.` and default ports stripped, public
    * tracking params removed, surviving params sorted — the
    * ClearURLs-style normalization crawl pipelines key dedup on).
    * Returns one row per canonical URL: (canon_url, n_docs, first_doc,
    * n_variants), where n_variants counts the distinct RAW forms the
    * canonicalization collapsed.
    *
    * Over-merge risk (ADVICE r16): canonicalization-keyed dedup MERGES
    * whatever the strip list removes, so the kernel strips UNAMBIGUOUS
    * tracker names only — bare `ref`/`spm` are kept because they carry
    * content on real sites (GitHub `?ref=branch`). A corpus whose URLs
    * use other semantic params under tracker-looking names needs the
    * list audited before trusting these clusters as dedup decisions.
    *
    * Scale shape: the kernel is row-local codegen; the only exchange is
    * the canon-keyed aggregate, map-side combined, and the output is
    * bounded by the DISTINCT canonical-URL count — group sizes grow
    * with the corpus, groups don't.
    */
  def urlCanonClusters(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    graft.functions.GraftFunctions.register(urls.sparkSession)
    urls.withColumn("canon_url", expr(s"url_canonicalize($urlCol)"))
      .groupBy(col("canon_url"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        countDistinct(col(urlCol)).cast("long").as("n_variants"))
  }

  /** Deterministic messy-URL synthesis for the p129 card — every branch
    * of the canonicalizer is exercised (mixed-case scheme/host/www,
    * default vs non-default ports on both schemes, trailing slash,
    * unsorted params, utm_ / fbclid tracking params, fragments, AND a
    * `ref=` param that must be KEPT — the ADVICE-r16 negative rule,
    * which also keys distinct lang clusters) while keeping the
    * CANONICAL key space bounded, so the cluster relation stays
    * fixed-size as the corpus grows. The formula is restated verbatim
    * in the DuckDB oracle.
    */
  def synthesizeUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      """concat(
        |  CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END, '://',
        |  CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'www.'
        |       WHEN doc_id % 4 = 2 THEN '' ELSE 'WwW.' END,
        |  source, '.Example.COM',
        |  CASE WHEN doc_id % 5 = 0 THEN ':443' WHEN doc_id % 5 = 1 THEN ':80' ELSE '' END,
        |  '/a/b', CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END, '?',
        |  CASE WHEN doc_id % 2 = 0
        |    THEN concat('utm_source=news&id=', cast(doc_id % 3 AS string), '&z=9&utm_campaign=x')
        |    ELSE concat('z=9&id=', cast(doc_id % 3 AS string), '&fbclid=XYZ',
        |      CASE WHEN doc_id % 3 = 0 THEN concat('&ref=', lang) ELSE '' END) END,
        |  CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)""".stripMargin).as("url"))

  /** KMV (bottom-k) corpus-overlap sketch — "how much does the incoming
    * half overlap the curated half" answered from two k-value sketches
    * instead of a corpus-sized join (Beyer et al. 2007, the k-minimum-
    * values distinct/overlap estimator). Sides are the even/odd doc_id
    * halves (the incremental-dedup fixture rule); values are md5-derived
    * shingle hashes, so every min is an integer any engine reproduces.
    *
    * Scale shape: each side is one DISTINCT on the hash and one
    * bottom-k — TakeOrdered's per-partition heads merged on the driver,
    * never a global sort — and everything after that is driver
    * arithmetic on <= 2k longs. The estimate itself stays integer:
    * jaccard_q20 = (|common in merged-k| << 20) / k_used, the same
    * cleared-denominator convention as the surprisal family.
    */
  def corpusOverlapSketch(docs: DataFrame, n: Int = 3, k: Int = 256): DataFrame = {
    require(k > 0, "k must be positive")
    val session = docs.sparkSession
    import session.implicits._
    val sh = shingles(docs, n, distinct = true)
    def bottomK(side: DataFrame): Array[Long] =
      side.select(Sampling.h56(col("shingle")).as("h")).distinct()
        .orderBy(col("h")).limit(k).collect().map(_.getLong(0))
    val a = bottomK(sh.filter(col("doc_id") % 2 === 0))
    val b = bottomK(sh.filter(col("doc_id") % 2 === 1))
    val merged = (a ++ b).distinct.sorted.take(k)
    val sa = a.toSet
    val sb = b.toSet
    val common = merged.count(h => sa(h) && sb(h)).toLong
    val kUsed = merged.length.toLong
    Seq((kUsed, merged.lastOption.getOrElse(0L), common,
      if (kUsed == 0) 0L else (common << 20) / kUsed))
      .toDF("k_used", "kth_min", "n_common", "jaccard_q20")
  }

  /** Pairwise SOURCE-overlap matrix (r12) — the "dataset venn" card a
    * multi-source corpus release publishes: for every pair of sources, a
    * KMV bottom-k Jaccard estimate between their shingle sets (the
    * [[corpusOverlapSketch]] estimator, matrixed). High off-diagonal
    * overlap means two ingests crawled the same sites — the signal that
    * decides whether cross-source dedup must run before mixing.
    *
    * Scale shape: ONE corpus pass builds all per-source sketches — the
    * (source, h) distinct aggregate is map-side combined, and the
    * per-source bottom-k runs through the cap-bounded
    * [[graft.functions.FirstKBySeq]] accumulator (≤ 2k entries per
    * buffer; never a per-source sort or window). Only #sources × k
    * longs reach the driver, where the #sources² pair merges are
    * driver-local integer arithmetic over those sketches — bounded by
    * the source-dimension cardinality, not the corpus. Estimates are the
    * same cleared-denominator integers as [[corpusOverlapSketch]]:
    * jaccard_q20 = (|common in merged bottom-k| << 20) div k_used.
    * Returns (src_a, src_b, k_used, n_common, jaccard_q20), src_a <
    * src_b.
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 3, k: Int = 256): DataFrame = {
    require(k > 0, "k must be positive")
    val session = docs.sparkSession
    import session.implicits._
    // NULL sources are excluded up front: a corpus with unset source
    // degrades to the pair matrix over the non-null sources (exactly the
    // rows the oracle's inner join keeps) instead of NPE-ing in the
    // driver-side sort/compare over collected source names. The filter
    // lands BEFORE shingling, so null-source documents never pay the
    // shingle explode the join would discard anyway.
    val sourced = docs.filter(col("source").isNotNull)
    val hs = shingles(sourced, n, distinct = true)
      .join(sourced.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), Sampling.h56(col("shingle")).as("h"))
      .distinct()
    val sk = hs.groupBy(col("source"))
      .agg(graft.functions.FirstKBySeq.firstK(k)(
        col("h"), col("h"), col("h").cast("string")).as("sketch"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).map(_.toLong).toArray)
      .sortBy(_._1)
    val rows = for {
      (sa, ha) <- sk.toSeq
      (sb, hb) <- sk.toSeq
      if sa < sb
    } yield {
      val merged = (ha ++ hb).distinct.sorted.take(k)
      val inA = ha.toSet
      val inB = hb.toSet
      val common = merged.count(x => inA(x) && inB(x)).toLong
      val kUsed = merged.length.toLong
      (sa, sb, kUsed, common, if (kUsed == 0) 0L else (common << 20) / kUsed)
    }
    rows.toDF("src_a", "src_b", "k_used", "n_common", "jaccard_q20")
  }

  /** Content-defined-chunking dedup card (r13) — the STORAGE-layer dedup
    * diagnostic (LBFS / FastCDC lineage): documents are split at
    * content-defined boundaries by the codegen'd
    * [[graft.functions.CdcChunks]] kernel (cut where the char-k-gram
    * rolling hash ≡ 0 mod `div`, expected chunk ≈ div+k chars), and the
    * card reports how many chunk-granular bytes a content-addressed
    * store would deduplicate. Complementary to the document-level
    * families: C4 keep-first cuts fixed WORD windows and rewrites docs,
    * winnowing fingerprints for similarity — CDC's shift-resilient byte
    * boundaries measure verbatim storage redundancy, the number a
    * snapshotting corpus store plans capacity with.
    *
    * Scale shape: chunking is map-only O(len)/doc inside whole-stage
    * codegen; the only exchange is the chunk-hash hash-aggregate (the
    * content-addressed chunk table itself — the p01 exact-dedup shape)
    * followed by a 1-row reduce. Returns one row: (n_docs, total_chunks,
    * distinct_chunks, dup_chunks, total_bytes, dup_bytes,
    * max_chunk_len), integers end to end.
    */
  def cdcChunkCard(docs: DataFrame, k: Int = 8, div: Int = 32): DataFrame = {
    val session = docs.sparkSession
    graft.functions.GraftFunctions.register(session)
    val base = docs.filter(col("text").isNotNull && length(col("text")) > 0)
    val chunks = base
      .select(explode(expr(s"cdc_chunks(text, $k, $div)")).as("chunk"))
      .select(md5(col("chunk")).as("cm"), octet_length(col("chunk")).cast("long").as("len"))
      .groupBy(col("cm"))
      .agg(count(lit(1)).cast("long").as("cnt"), max(col("len")).as("len"))
    chunks
      .agg(sum(col("cnt")).cast("long").as("total_chunks"),
        count(lit(1)).cast("long").as("distinct_chunks"),
        sum(col("cnt") - 1).cast("long").as("dup_chunks"),
        sum(col("cnt") * col("len")).cast("long").as("total_bytes"),
        sum((col("cnt") - 1) * col("len")).cast("long").as("dup_bytes"),
        max(col("len")).as("max_chunk_len"))
      .crossJoin(broadcast(base.agg(count(lit(1)).cast("long").as("n_docs"))))
      .select(col("n_docs"), col("total_chunks"), col("distinct_chunks"),
        col("dup_chunks"), col("total_bytes"), col("dup_bytes"),
        col("max_chunk_len"))
  }
}
