package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * - Brute-force cosine top-k: exact baseline. The query side is small and
  *   broadcast; the corpus side streams, so the plan is a broadcast
  *   nested-loop + per-query top-k — no corpus shuffle.
  * - Random-hyperplane LSH: the scale path. Each vector hashes to a bucket
  *   from the sign pattern of `numPlanes` fixed +-1 hyperplanes; neighbor
  *   candidates are same-bucket pairs (hash-partitioned equi-join, linear
  *   in corpus size).
  *
  * Dot products run through the codegen'd [[graft.functions.DotProduct]]
  * expression — a sequential double fold, so an external oracle evaluating
  * the same fold (e.g. DuckDB list_sum over the products) reproduces every
  * score bit-exactly.
  */
object Similarity {

  /** Sparse TF-IDF cosine verification over MinHash-LSH candidates — the
    * term-vector counterpart to the dense-embedding ops: candidate pairs
    * come from the banded LSH join (linear in corpus size), and each is
    * verified by an EXACT integer cosine computed row-locally. Weights
    * are integers (w = tf * min(n_docs div df, idfCap)), so dot products
    * and squared norms are exact integer sums — immune to float
    * summation-order drift — and the cosine is three fixed-order IEEE
    * ops on those integers. The idf cap bounds each weight against an
    * uncapped hapax term whose weight IS n_docs; beyond that, each
    * FACTOR is widened to decimal before its multiply and the sums
    * accumulate as DECIMAL(38,0) — matching DuckDB's HUGEINT promotion
    * of both the product and SUM(BIGINT) — so even a multi-million-token
    * document (tf ≈ 3e6 → w ≈ 3e9 → w*w ≈ 9e18 ≳ Long.MaxValue) cannot
    * wrap a product or the norm into a negative long (sqrt → NaN →
    * silently dropped pairs) the way int64 arithmetic would.
    *
    * Scale shape: the shared-term equi-join form of the numerator is
    * quadratic in posting-list length (a corpus-stopword term fans out
    * df² — on a shared-vocabulary corpus that is all-pairs); instead each
    * doc's weight vector travels to the candidate pair as a TERM-SORTED
    * entry array (one sort per doc at aggregation time) and the codegen'd
    * [[graft.functions.SortedDotLong]] merge-walks the two arrays —
    * O(|a|+|b|) per pair with no per-pair allocation, vs the O(|a|·|b|)
    * linear map probes an `element_at` fold pays. Total cost linear in
    * candidates. The oracle states the same values through the join form
    * (integer sums are order-independent, so both forms are bit-equal).
    */
  def tfidfCosinePairs(docs: DataFrame, threshold: Double = 0.6,
      idfCap: Int = 1000): DataFrame = {
    // isnotnull(doc_id) up front mirrors the filter the candidate joins
    // infer downstream, and sum(tf) pins tf's count aggregate into the df
    // branch — together they keep both consumers canonically identical so
    // the (doc_id, term) exchange (and the explode feeding it) is planned
    // once and reused (r17; was two full explode passes).
    val tf = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // Same isnotnull filter as tf/df (ADVICE r17): on a corpus that did
    // contain null doc_ids, an unfiltered count would shift every idf
    // weight while tf/df exclude those rows — the three idf inputs must
    // agree. doc_id is never null on the fixtures, so no value changes.
    val nDocs = docs.filter(col("doc_id").isNotNull)
      .select(count(lit(1)).as("n_docs"))
    val termDf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("__pin"))
      // Always true (tf >= 1): keeps the pin LIVE so pruning cannot
      // specialize this branch's subtree away from the shared exchange.
      .filter(col("__pin") > 0)
      .select(col("term"), col("df"))
    val w = tf
      .join(termDf, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        (col("tf") * least(expr("n_docs div df"), lit(idfCap.toLong))).as("w"))
    // Each FACTOR is widened to decimal before the multiply (mirroring
    // DuckDB's HUGEINT promotion of the product): a tf of ~3e6 on an
    // idfCap-weighted term gives w ≈ 3e9, so w*w in int64 would wrap
    // negative and NaN the norm — casting only the product's result
    // would be too late.
    GraftFunctions.register(docs.sparkSession)
    val wDec = col("w").cast("decimal(19,0)")
    // Entries sorted by term (terms are unique per doc, so the struct
    // sort IS a term sort) — the merge-walk precondition, paid once per
    // doc in the aggregate rather than per candidate pair.
    val docVecs = w.groupBy(col("doc_id")).agg(
      sort_array(collect_list(struct(col("term"), col("w")))).as("wv"),
      sum(wDec * wDec).as("n2"))
    Dedup.minhashLshCandidates(docs)
      .join(docVecs.select(col("doc_id").as("i"), col("wv").as("va"), col("n2").as("n2a")), "i")
      .join(docVecs.select(col("doc_id").as("j"), col("wv").as("vb"), col("n2").as("n2b")), "j")
      .withColumn("num", expr("sorted_dot_long(va, vb)"))
      .select(col("i"), col("j"),
        (col("num").cast("double")
          / (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double")))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** (vec_id, v float[], nrm) with nrm the L2 norm. */
  def normalized(emb: DataFrame): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  /** All pairs with cosine >= threshold — the exact VERIFICATION-ONLY
    * baseline, quadratic by construction. Dense embeddings admit no exact
    * equi-join candidate scheme at low thresholds (unlike simhash's
    * pigeonhole: a 0.4-cosine ball spans ~one pivot-distance band, so
    * triangle-inequality banding prunes nothing), so the scale paths are
    * the approximate ones: [[lshCandidates]] / [[ivfTopK]] with
    * recall pinned against this baseline in OpsSpec.
    *
    * To keep the quadratic form from being run at corpus scale by
    * accident, the input is guarded: corpora above `maxRows` (default
    * 100k rows = ~5e9 pair evaluations, the single-machine verification
    * ceiling) are refused with a pointer at the scale paths. The guard
    * probes `limit(maxRows + 1).count()` — LocalLimit early-exits each
    * partition, so the probe's cost is bounded by the cap even when the
    * input is an expensive computed lineage, not a raw scan.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    // Caps at or above Int.MaxValue effectively disable the guard (limit
    // is Int-typed); clamp instead of overflowing to a negative limit.
    val probeLimit = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val probed = emb.limit(probeLimit).count()
    require(probed <= maxRows,
      s"nearDupPairs is the exact quadratic verification baseline (input " +
        s"exceeds the $maxRows-row cap = ~${maxRows * maxRows / 2} pair " +
        "evaluations); at corpus scale use lshCandidates/ivfTopK and verify " +
        "candidates only.")
    val n = normalized(emb)
    val a = n.select(col("vec_id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("i") < col("j"))
      .withColumn("cos", expr("vec_dot(va, vb)") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }

  /** Exact top-k neighbors for each query vector (queries broadcast).
    *
    * Ranking goes through the bounded-heap [[graft.functions.TopKByScore]]
    * aggregate, not a `Window.partitionBy(q_id)`: the window form funnels
    * the whole corpus x queries scored set into #queries reducers (a skew
    * wall at scale); the aggregate keeps map-side buffers at k entries and
    * shuffles only #partitions * k rows per query.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val n = normalized(emb)
    val q = normalized(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    rankTopK(scored, k)
  }

  /** (q_id, cos, vec_id) -> per-query (q_id, n_id, rnk, cos), rnk 1..k by
    * cosine desc (vec_id tiebreak), via bounded-heap aggregation.
    */
  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label — near the anchor in embedding space but known
    * non-matches, the negatives that actually move a contrastive loss
    * (random negatives are trivially separable).
    *
    * Scale shape: identical to [[bruteForceTopK]] (broadcast queries,
    * codegen'd vec_dot at scan speed, bounded-heap per-query top-k — no
    * corpus shuffle, no window); the label filter rides the join
    * condition. For corpus-x-corpus mining swap the broadcast side for
    * the IVF/PQ index paths (p18/p44) exactly as for search.
    */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val n = emb.select(col("vec_id"), col("embedding").as("v"), col("label"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("label").as("q_label"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    val scored = n.join(broadcast(q),
      col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    rankTopK(scored, k)
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.topK(k)(col("cos"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(
        col("q_id"),
        col("col._2").as("n_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col._1").as("cos"))

  /** Deterministic +-1 hyperplanes: plane p, dim i weight is +1 when the
    * first hex digit of md5("p:i") is even. Fixed constants — any engine
    * with md5 reproduces them.
    */
  def planes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val h = mdig.digest(s"$p:$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** vec_id -> LSH bucket id in [0, 2^numPlanes). The plane matrix is a
    * constant folded into the plan (computed once on the driver, not per
    * row).
    */
  def lshBuckets(emb: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val pl = planes(numPlanes, dim)
    val n = normalized(emb)
    val bucket = pl.zipWithIndex.map { case (w, p) =>
      val arr = w.mkString("array(", "D,", "D)")
      when(expr(s"vec_dot(v, $arr)") > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    n.select(col("vec_id"), bucket.cast("long").as("bucket"))
  }

  /** IVF coarse quantizer: assign each vector to its max-cosine centroid.
    * Centroids here are the first `cells` corpus vectors — a deterministic
    * stand-in for a k-means codebook (the assignment/search plumbing is
    * identical; a trained codebook would be broadcast the same way).
    */
  def ivfAssign(emb: DataFrame, cells: Int = 16): DataFrame = {
    val n = normalized(emb)
    val cents = n.filter(col("vec_id") < cells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    assignCells(n, cents)
  }

  /** Max-cosine cell per vector against a broadcast centroid table.
    * max_by over (ccos, -c_id) = argmax by cosine with min-c_id tiebreak.
    * A hash aggregate with map-side combine: no window shuffle-sort, and
    * the cells-per-vector fanout collapses before any exchange.
    */
  private def assignCells(n: DataFrame, cents: DataFrame): DataFrame =
    n.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("c_id"), struct(col("ccos"), -col("c_id"))).as("cell"))
      .select(col("vec_id"), col("cell"))

  /** IVF search: probe the `nprobe` nearest cells per query, rank only the
    * candidates in those cells. Candidate generation is a broadcast of the
    * tiny codebook + an equi-join on cell — linear in corpus size, with
    * recall controlled by nprobe.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 4, cells: Int = 16): DataFrame = {
    val n = normalized(emb)
    val withCell = n.join(ivfAssign(emb, cells), "vec_id")
    ivfSearch(centroidsOf(n, cells), normalizedQueries(queries), withCell, k, nprobe)
  }

  private def centroidsOf(n: DataFrame, cells: Int): DataFrame =
    n.filter(col("vec_id") < cells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))

  private def normalizedQueries(queries: DataFrame): DataFrame =
    normalized(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))

  /** Shared IVF search tail for the unfiltered and filtered paths:
    * probe-cell selection — nprobe best cells per query via an array
    * sort of the per-query (qcos, c_id) pairs, #cells entries per query,
    * no window exchange (sort_array over struct(-qcos, c_id) = qcos
    * desc, c_id asc) — then the cell equi-join and bounded-heap top-k.
    */
  private def ivfSearch(cents: DataFrame, q: DataFrame, withCell: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val qTop = q.crossJoin(broadcast(cents))
      .withColumn("qcos", expr("vec_dot(qv, cv)") / (col("qn") * col("cn")))
      .groupBy(col("q_id"))
      .agg(slice(
        sort_array(collect_list(struct(-col("qcos"), col("c_id")))),
        1, nprobe).as("top"))
      .select(col("q_id"), explode(col("top.c_id")).as("cell"))
    val qCells = qTop.join(broadcast(q), "q_id")
    rankTopK(
      qCells.join(withCell, "cell")
        .filter(col("vec_id") =!= col("q_id"))
        // (q_id, vec_id) is already unique: each vector lives in exactly one
        // cell and the probed cells per query are distinct.
        .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("nrm"))),
      k)
  }

  /** FILTERED vector search (r12) — top-k under a metadata predicate,
    * the retrieval-under-constraint every curation pipeline runs
    * ("nearest neighbors among label-L vectors only": dedup against one
    * source, per-class hard negatives, licensed-subset retrieval). The
    * semantics are PRE-FILTERING over the shared index: centroids and
    * probe-cell selection come from the FULL corpus (the index is built
    * once; a query-time predicate must not change the codebook), while
    * candidate vectors are restricted to the admitted labels BEFORE the
    * cell join — so the result is the exact top-k of (probed cells ∩
    * filter), and recall-vs-nprobe behaves like unfiltered IVF on the
    * admitted subset.
    *
    * Scale shape: the label predicate is a scan-level pushdown
    * (PushedFilters on the parquet read — only admitted row groups are
    * even read), assignment of the admitted vectors is the same
    * broadcast-codebook fanout-collapse as [[ivfAssign]] (argmax against
    * FULL-corpus centroids commutes with the filter, so no second
    * index), and everything downstream is [[ivfTopK]]'s candidate
    * equi-join + bounded-heap top-k. Post-filtering (search first, drop
    * non-matching) is deliberately NOT offered: under a selective filter
    * it silently returns fewer than k with no recall control.
    */
  def filteredIvfTopK(emb: DataFrame, queries: DataFrame, labels: Seq[Int],
      k: Int = 5, nprobe: Int = 4, cells: Int = 16): DataFrame = {
    require(labels.nonEmpty, "need at least one admitted label")
    val cents = centroidsOf(normalized(emb), cells) // FULL-corpus codebook
    val nf = normalized(emb.filter(col("label").isin(labels: _*)))
    val withCell = nf.join(assignCells(nf, cents), "vec_id")
    ivfSearch(cents, normalizedQueries(queries), withCell, k, nprobe)
  }

  /** Symmetric int8 quantization per vector: scale = 127/max|x| (1.0 for
    * a zero vector), q_i = floor(x_i*scale + 0.5) — 4x memory reduction
    * for ANN indexes at corpus scale. Row-local and fully deterministic
    * (max, division, and floor are exact-rounded the same way in any
    * IEEE engine), so quantized indexes are reproducible across runs and
    * engines. Returns (vec_id, amax, scale, q) with q an int array.
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("scale",
        when(col("amax") > 0, lit(127.0) / col("amax")).otherwise(lit(1.0)))
      .withColumn("q",
        expr("transform(v, x -> CAST(FLOOR(x * scale + 0.5D) AS INT))"))
      .select(col("vec_id"), col("amax"), col("scale"), col("q"))

  /** Brute-force top-k over int8-QUANTIZED vectors: the memory-bound scale
    * path (a quantized 100 TB index is 25 TB — often the difference
    * between spilling and staying resident). Scoring is the integer dot
    * product dequantized by the two amax factors: every product/sum is an
    * exact small integer in doubles (<= 127^2 * dims << 2^53), so ranking
    * is deterministic and any engine reproduces the scores bit-exactly.
    * Same broadcast + bounded-heap shape as [[bruteForceTopK]].
    */
  def quantizedTopK(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    def qd(df: DataFrame) = quantizeInt8(df)
      .select(col("vec_id"), col("amax"),
        expr("transform(q, x -> CAST(x AS DOUBLE))").as("qv"))
    val d = qd(emb)
    val q = qd(queries)
      .select(col("vec_id").as("q_id"), col("amax").as("q_amax"), col("qv").as("qqv"))
    val scored = d.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr("vec_dot(qqv, qv)") * col("q_amax") * col("amax") / lit(16129.0))
    rankTopK(scored, k).withColumnRenamed("cos", "adot")
  }

  /** Bucket shift that balances the two fold levels at O(√N): level-1
    * groups hold ≤ 2^shift vec_ids, level-2 folds N/2^shift bucket sums,
    * and 2^shift ≈ √N keeps BOTH far from corpus size (at 10¹¹ vectors:
    * ~320k-element lists instead of the fixed shift-8 form's N/256 ≈
    * 4×10⁸ level-2 state). Exposed so trainers can derive it from one
    * cheap count when the caller doesn't pin a shift.
    */
  private[graft] def sqrtShift(n: Long): Int =
    math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(math.max(n, 2L) - 1)) / 2)

  /** Resolve a caller bucketShift: positive = pinned (the fold ORDER —
    * and therefore the float result — depends on the shift, so
    * oracle-gated cards pin the shift their oracle SQL hard-codes);
    * 0 = derive [[sqrtShift]] from one metadata-cheap count (this makes
    * CONSTRUCTION run that count job — the trainers are driver-looped
    * and eager anyway; pass an explicit shift for plan-only use).
    */
  private[graft] def resolveShift(emb: DataFrame, bucketShift: Int): Int = {
    require(bucketShift >= 0 && bucketShift <= 40, "bucketShift in [0, 40]")
    if (bucketShift > 0) bucketShift else sqrtShift(emb.count())
  }

  /** Per-(cell, dimension) centroid means over an assigned vector set —
    * the k-means M-step kernel shared by [[kmeansStep]] and
    * [[kmeansTrain]]. The mean is an exact-ORDER sum (double addition is
    * order-dependent; a plain SUM would differ run to run), computed as
    * the same two-level hierarchical fold as [[topSingularDirection]]:
    * vec_id-ordered within each (cell, dimension, vec_id >> bucketShift)
    * bucket, then bucket-ordered across the bucket sums. Both levels are
    * explicit order-defined folds, so refined centroids stay
    * bit-reproducible across engines and partitionings, while the
    * largest materialized list is max(2^bucketShift, N / 2^bucketShift)
    * elements — a popular cell never funnels its full population into
    * one group the way a flat per-(cell, dimension) collect would (the
    * executor-OOM shape at corpus scale). The count denominator is an
    * order-independent integer sum of the bucket counts.
    *
    * Input: (vec_id, cell, vd: array<double>).
    */
  private[ops] def centroidMeans(withCell: DataFrame, bucketShift: Int): DataFrame =
    withCell
      .select(col("vec_id"), shiftright(col("vec_id"), bucketShift).as("bkt"),
        col("cell"), posexplode(col("vd")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"), col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("arr"))
      .select(col("cell"), col("pos"), col("bkt"),
        expr("aggregate(transform(arr, s -> s.x), 0D, (a, b) -> a + b)").as("bs"),
        size(col("arr")).cast("long").as("cnt"))
      .groupBy(col("cell"), col("pos"))
      .agg(sort_array(collect_list(struct(col("bkt"), col("bs")))).as("barr"),
        sum(col("cnt")).as("n"))
      .select(col("cell"), col("pos"),
        (expr("aggregate(transform(barr, t -> t.bs), 0D, (a, b) -> a + b)")
          / col("n")).as("c"))

  /** One k-means refinement step (the M-step) over the IVF assignment:
    * per (cell, dimension) centroid means via the two-level bounded-state
    * fold of [[centroidMeans]]. bucketShift 0 (the default) derives the
    * O(√N)-balanced shift from one cheap count; oracle-gated callers pin
    * the shift their oracle SQL hard-codes (the fold order — and so the
    * float result — depends on it).
    */
  def kmeansStep(emb: DataFrame, cells: Int = 16, bucketShift: Int = 0): DataFrame =
    centroidMeans(
      emb
        .join(ivfAssign(emb, cells), "vec_id")
        .select(col("vec_id"), col("cell"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vd")),
      resolveShift(emb, bucketShift))

  /** Multi-iteration Lloyd k-means TRAINING over the embedding corpus —
    * the full clustering loop ([[kmeansStep]] is one M-step; this chains
    * E and M steps and returns the final assignment, the cluster-id
    * column SemDeDup / stratified mixing / per-cluster sampling consume).
    * Seeds are the first `cells` vectors (deterministic, like
    * [[ivfAssign]]); each iteration assigns every vector to its
    * max-cosine centroid (min-id tiebreak) and recomputes per-(cell,
    * dimension) means as the vec_id-sorted sequential fold, so the whole
    * trajectory — every intermediate centroid double — is bit-reproducible
    * in any engine; empty cells keep their previous centroid.
    *
    * Scale shape: the model state (cells × dims doubles) lives on the
    * driver between iterations — the same bounded-collect contract as BPE
    * merge training (model state, never data). Per iteration: one
    * broadcast of the centroid table, one max_by hash aggregate for the
    * E-step (16-way fanout collapses map-side, no window), and the
    * two-level bucketed M-step fold of [[centroidMeans]] — no group ever
    * materializes a cell's full population. Corpus crosses the wire once
    * per iteration.
    */
  def kmeansTrain(emb: DataFrame, cells: Int = 16, iters: Int = 2,
      bucketShift: Int = 0): DataFrame = {
    require(cells > 0 && iters >= 0, "cells must be positive, iters non-negative")
    val shift = resolveShift(emb, bucketShift)
    GraftFunctions.register(emb.sparkSession)
    val session = emb.sparkSession
    import session.implicits._
    val vecs = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vd"))
    var cents: Seq[(Long, Seq[Double])] = vecs.filter(col("vec_id") < cells)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    def assign(): DataFrame = {
      val cdf = broadcast(cents.toDF("c_id", "cv")
        .withColumn("cn", sqrt(expr("vec_dot(cv, cv)"))))
      vecs
        .withColumn("nrm", sqrt(expr("vec_dot(vd, vd)")))
        .crossJoin(cdf)
        .withColumn("ccos", expr("vec_dot(vd, cv)") / (col("nrm") * col("cn")))
        .groupBy(col("vec_id"))
        .agg(max_by(col("c_id"), struct(col("ccos"), -col("c_id"))).as("cell"))
    }
    for (_ <- 1 to iters) {
      val means = centroidMeans(vecs.join(assign(), "vec_id"), shift)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val byCell = means.groupBy(_._1).map { case (cid, xs) =>
        cid -> xs.sortBy(_._2).map(_._3).toSeq
      }
      cents = cents.map { case (cid, old) => (cid, byCell.getOrElse(cid, old)) }
    }
    assign()
  }

  /** Top singular direction of the embedding matrix by power iteration —
    * the dimensionality-reduction / whitening prep step (the dominant
    * component is what "all-but-the-top" post-processing removes from
    * embedding spaces, and the first thing a PCA/whitening pass
    * extracts). Returns one row per dimension: (pos, loading,
    * sv_fraction) where sv_fraction = ||Xv||²/Σ||x||² is the fraction of
    * total (uncentered) variance the direction explains.
    *
    * Scale shape — a HIERARCHICAL deterministic reduction: v_{t+1} ∝
    * Xᵀ(Xv_t) needs an exact-order sum over all N vectors per dimension,
    * and a single vec_id-ordered fold per dimension would funnel N
    * values into one group. Instead the fold is two-level: vec_id-ordered
    * within each (dimension, vec_id >> bucketShift) bucket — bounded
    * partial lists — then bucket-ordered across the bucket sums. Both
    * levels are explicit ORDER-defined folds, so the result is
    * bit-reproducible in any engine while the largest materialized list
    * is max(2^bucketShift, N / 2^bucketShift) elements — bucketShift 0
    * (the default) derives the O(√N)-balancing shift from one cheap
    * count, an explicit shift pins the fold order for oracle-gated
    * callers, and both levels stay far from corpus size (the
    * same reason GlobalRank sums partition offsets instead of running
    * one global window). The per-iteration driver state is the d-vector
    * itself.
    */
  def topSingularDirection(emb: DataFrame, iters: Int = 2, dims: Int = 64,
      bucketShift: Int = 0): DataFrame = {
    require(iters >= 1 && dims > 0, "need iters >= 1 and positive dims")
    val shift = resolveShift(emb, bucketShift)
    GraftFunctions.register(emb.sparkSession)
    val session = emb.sparkSession
    val vecs = emb.select(col("vec_id"),
      shiftright(col("vec_id"), shift).as("bkt"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vd"))
    val v = powerLoop(vecs, iters, dims)
    val fraction = explainedFraction(vecs, v)
    import session.implicits._
    v.zipWithIndex.map { case (x, i) => (i, x, fraction) }.toSeq
      .toDF("pos", "loading", "sv_fraction")
  }

  /** The power-iteration loop over a prepared (vec_id, bkt, vd)
    * relation — the two-level order-defined fold documented on
    * [[topSingularDirection]], shared with [[allButTheTop]] (which runs
    * it on CENTERED vectors). Returns the unit-norm direction.
    */
  private def powerLoop(vecs: DataFrame, iters: Int, dims: Int): Array[Double] = {
    var v: Array[Double] = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 1 to iters) {
      // Level 1 folds WHOLE scaled vectors per bucket — the elementwise
      // vec_fold_sum over the vec_id-sorted collect is bit-identical to
      // a per-position scalar fold in the same order, but the corpus is
      // never position-exploded: only the #buckets bucket-sum vectors
      // explode (a metadata-sized relation) before the per-position
      // level-2 fold. Per-group state stays max(2^bucketShift,
      // N / 2^bucketShift) rows, as before.
      val w = vecs
        .withColumn("s", call_function("vec_dot", col("vd"), typedlit(v.toSeq)))
        .withColumn("xs", expr("transform(vd, x -> x * s)"))
        .groupBy(col("bkt"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("xs")))).as("arr"))
        .select(col("bkt"),
          expr("vec_fold_sum(transform(arr, t -> t.xs))").as("bsv"))
        .select(col("bkt"), posexplode(col("bsv")).as(Seq("pos", "bs")))
        .groupBy(col("pos"))
        .agg(sort_array(collect_list(struct(col("bkt"), col("bs")))).as("barr"))
        .select(col("pos"),
          expr("aggregate(transform(barr, t -> t.bs), 0D, (a, b) -> a + b)").as("w"))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).map(_._2)
      var nrm2 = 0.0
      w.foreach(x => nrm2 += x * x) // pos-ascending left fold, as the oracle's list_sum
      val nrm = math.sqrt(nrm2)
      v = w.map(_ / nrm)
    }
    v
  }

  /** ||Xv||²/Σ||x||² via the same two-level fold over the scalar pairs
    * (s², ||x||²) — shared by [[topSingularDirection]] (raw vectors) and
    * [[allButTheTop]] (centered vectors, where it is the fraction of
    * centered energy the removed direction carried).
    */
  private def explainedFraction(vecs: DataFrame, v: Array[Double]): Double = {
    val fr = vecs
      .withColumn("s", call_function("vec_dot", col("vd"), typedlit(v.toSeq)))
      .withColumn("nx", call_function("vec_dot", col("vd"), col("vd")))
      .groupBy(col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"),
        (col("s") * col("s")).as("ss"), col("nx")))).as("arr"))
      .select(col("bkt"),
        expr("aggregate(transform(arr, t -> t.ss), 0D, (a, b) -> a + b)").as("ssb"),
        expr("aggregate(transform(arr, t -> t.nx), 0D, (a, b) -> a + b)").as("nxb"))
      .agg(
        expr("aggregate(transform(sort_array(collect_list(struct(bkt, ssb))), t -> t.ssb), 0D, (a, b) -> a + b)").as("ss"),
        expr("aggregate(transform(sort_array(collect_list(struct(bkt, nxb))), t -> t.nxb), 0D, (a, b) -> a + b)").as("nx"))
      .collect()(0)
    fr.getDouble(0) / fr.getDouble(1)
  }

  /** The distributed per-position mean over a prepared (vec_id, bkt, vd)
    * relation: level-1 whole-vector vec_id-ordered fold per bucket,
    * level-2 bucket-ordered scalar fold per position, one division by
    * the exact count — identical operand order to a driver loop over
    * bucket sums in bucket order, but the only rows that leave the
    * cluster are the `dims` (pos, mu) results. Package-visible so
    * PlanAuditSpec can pin the dims-row contract.
    */
  private[graft] def meanFoldDF(vecs: DataFrame, dims: Int): DataFrame = {
    vecs
      .groupBy(col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("vd")))).as("arr"),
        count(lit(1)).as("cnt"))
      .select(col("bkt"), expr("vec_fold_sum(transform(arr, t -> t.vd))").as("bsv"),
        col("cnt"))
      .select(col("bkt"), col("cnt"), posexplode(col("bsv")).as(Seq("pos", "bs")))
      .groupBy(col("pos"))
      // Each bucket contributes exactly one row per position, so the
      // per-pos sum of cnt is the exact corpus count n (a long sum —
      // no float drift).
      .agg(sort_array(collect_list(struct(col("bkt"), col("bs")))).as("barr"),
        sum(col("cnt")).cast("long").as("n"))
      .select(col("pos"),
        (expr("aggregate(transform(barr, t -> t.bs), 0D, (a, b) -> a + b)") /
          col("n").cast("double")).as("mu"))
  }

  /** "All-but-the-top" embedding post-processing card (Mu & Viswanath
    * 2018) — the standard isotropy fix retrieval pipelines apply before
    * cosine search: subtract the corpus mean, then project out the
    * dominant direction of the CENTERED embeddings. Returns one row per
    * dimension: (pos, mean, loading, sum_after, removed_fraction) —
    * the mean vector, the removed direction, the order-defined fold of
    * the post-processed values per dimension (the checksum that pins the
    * whole transform bit-for-bit: it is the float residue of sums that
    * cancel exactly in real arithmetic), and the fraction of centered
    * energy the removed direction carried.
    *
    * Scale shape: the mean and every reported sum use the SAME
    * hierarchical two-level order-defined fold as
    * [[topSingularDirection]] (vec_id within bucket, bucket across), so
    * all reductions are bit-reproducible in any engine with per-group
    * state bounded at max(2^bucketShift, N/2^bucketShift); centering
    * and the projection are row-local expressions against the
    * driver-held d-vectors (mean, direction) — the bounded-collect
    * contract the kmeans/BPE training loops established. Three corpus
    * passes total (mean; power iterations; transform folds).
    */
  def allButTheTop(emb: DataFrame, iters: Int = 2, dims: Int = 64,
      bucketShift: Int = 0): DataFrame = {
    require(iters >= 1 && dims > 0, "need iters >= 1 and positive dims")
    val shift = resolveShift(emb, bucketShift)
    GraftFunctions.register(emb.sparkSession)
    val session = emb.sparkSession
    val vecs = emb.select(col("vec_id"),
      shiftright(col("vec_id"), shift).as("bkt"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vd"))
    // Mean: level-1 whole-vector fold per bucket (+ its count), then the
    // level-2 bucket-ordered fold runs DISTRIBUTED per position (the
    // same pos-keyed fold powerLoop uses) with ONE division per
    // position — the oracle's list_sum(list(bs ORDER BY bkt)) / n chain
    // exactly, and only `dims` rows ever reach the driver (the r13 form
    // collected one row per bucket — N/2^bucketShift × dims doubles at
    // corpus scale).
    val murows = meanFoldDF(vecs, dims)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    // Ragged embedding arrays would yield more (or fewer) positions
    // than `dims` and silently misalign mu with vector positions — the
    // fold's dims-row contract is enforced, not assumed.
    require(murows.length == dims && murows.map(_._1).toSeq == (0 until dims),
      s"meanFoldDF returned ${murows.length} positions; expected $dims " +
        "(ragged or truncated embedding arrays?)")
    val mu = murows.map(_._2)
    val muLit = typedlit(mu.toSeq)
    val cvecs = vecs.withColumn("vd",
      zip_with(col("vd"), muLit, (x, m) => x - m))
    val v = powerLoop(cvecs, iters, dims)
    val frac = explainedFraction(cvecs, v)
    val vLit = typedlit(v.toSeq)
    // Post-processed residual t = c - (v·c)v, folded per dimension with
    // the same two-level chain.
    val sums = cvecs
      .withColumn("s", call_function("vec_dot", col("vd"), vLit))
      .withColumn("td", zip_with(col("vd"), vLit, (x, vi) => x - col("s") * vi))
      .groupBy(col("bkt"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("td")))).as("arr"))
      .select(col("bkt"), expr("vec_fold_sum(transform(arr, t -> t.td))").as("bsv"))
      .select(col("bkt"), posexplode(col("bsv")).as(Seq("pos", "bs")))
      .groupBy(col("pos"))
      .agg(sort_array(collect_list(struct(col("bkt"), col("bs")))).as("barr"))
      .select(col("pos"),
        expr("aggregate(transform(barr, t -> t.bs), 0D, (a, b) -> a + b)").as("sum_after"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    import session.implicits._
    (0 until dims).map(p => (p, mu(p), v(p), sums(p), frac)).toSeq
      .toDF("pos", "mean", "loading", "sum_after", "removed_fraction")
  }

  /** ANN recall evaluation card — the artifact that decides nprobe/cells
    * before an index ships (the similarity-family analog of the dedup
    * family's LSH tuning card): per query, how many of the exact
    * brute-force top-k the IVF index actually returned. Both sides are
    * the already-proven plans ([[bruteForceTopK]], [[ivfTopK]]); the
    * card is one semi-join + count over their k-bounded outputs, so its
    * cost is the two searches. recall_q20 is the cleared-denominator
    * integer (hits << 20) / k.
    */
  def annRecallCard(emb: DataFrame, k: Int = 5, nprobe: Int = 2,
      cells: Int = 16, nQueries: Int = 8): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
    val brute = bruteForceTopK(emb, q, k).select(col("q_id"), col("n_id"))
    val ivf = ivfTopK(emb, q, k, nprobe, cells).select(col("q_id"), col("n_id"))
    val hits = brute.join(ivf, Seq("q_id", "n_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("h"))
    q.select(col("vec_id").as("q_id"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("h"), lit(0L)).cast("long").as("n_hits"),
        expr(s"CAST(coalesce(h, 0) * 1048576 DIV $k AS BIGINT)").as("recall_q20"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., 2023,
    * arXiv:2303.09540): cluster the embeddings with the coarse quantizer,
    * then drop any vector whose WITHIN-CLUSTER cosine to a smaller-id
    * vector reaches the threshold — paraphrase-level duplication that no
    * shingle or simhash scheme sees. The min-id survivor rule matches the
    * exact/MinHash dedup family (the paper keeps the lowest
    * centroid-similarity example; survivor choice doesn't change WHICH
    * groups collapse, and min-id keeps the rule engine-reproducible).
    *
    * Scale shape — the paper's core trick, preserved: candidate pairs are
    * generated per CELL (one equi-join on the cell key), so the quadratic
    * cost is Σ|cell|², not |corpus|²; at 100 TB the cell count grows with
    * the corpus so cells stay bounded and the join stays linear-ish. The
    * only corpus-wide ops are the assignment aggregate and one hash
    * shuffle on cell; the drop-set anti-join is a shuffle on vec_id.
    * Returns (vec_id, cell) of the survivors.
    */
  def semDedupKeep(emb: DataFrame, cells: Int = 16,
      threshold: Double = 0.35): DataFrame = {
    val withCell = normalized(emb).join(ivfAssign(emb, cells), "vec_id")
    val dropped = withCell.as("a")
      .join(withCell.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(expr("vec_dot(a.v, b.v)") / (col("a.nrm") * col("b.nrm"))
        >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    withCell.select(col("vec_id"), col("cell"))
      .join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Same-bucket candidate pairs — the ANN pre-filter at scale. */
  def lshCandidates(emb: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val b = lshBuckets(emb, numPlanes, dim)
    b.as("a").join(b.as("c"),
        col("a.bucket") === col("c.bucket") && col("a.vec_id") < col("c.vec_id"))
      .select(col("a.vec_id").as("i"), col("c.vec_id").as("j"), col("a.bucket").as("bucket"))
  }
}
