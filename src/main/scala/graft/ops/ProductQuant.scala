package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the embedding column — the memory-side
  * ANN scale path, complementing IVF (routing) and int8 (per-vector
  * scaling): each vector is split into `m` subvectors and every subvector
  * is replaced by the id of its nearest subspace centroid, compressing a
  * 64-dim float vector to `m` byte-sized codes (16x smaller at the
  * defaults; a trained codebook and wider subspaces push this to 64x), which is what lets the
  * candidate-scoring side of a search stay memory-resident; search uses
  * asymmetric distance computation (ADC): per query, a tiny
  * (m x ks) lookup table of exact subspace distances is broadcast and
  * corpus vectors are scored by summing m table entries — no per-row
  * float vector math at all.
  *
  * Determinism: subspace distances are SEQUENTIAL folds over the
  * subvector dimensions (`aggregate(zip_with(...))`), so any engine
  * evaluating the same fold reproduces every distance bit-exactly; code
  * assignment breaks ties on the centroid id, and ADC sums the m partial
  * distances in fixed subspace order (sorted collect + fold, not SUM).
  *
  * The codebook is TRAINED: seeded with the first `ks` corpus vectors'
  * subvectors, then refined by `trainIters` Lloyd iterations per
  * subspace (assign to nearest centroid; replace each centroid by the
  * per-dimension mean of its assigned subvectors — [[Similarity
  * .kmeansStep]]'s fixed-order-fold mean applied per subspace). Every
  * step is deterministic (id tiebreaks, vec_id-ordered summation), so
  * refined centroids are bit-reproducible in any engine and the trained
  * assignment stays oracle-derivable. Empty cells keep their previous
  * centroid. Training changes only the broadcast constants, never the
  * search plan shape: the corpus pays one extra assignment pass per
  * iteration, each producing a tiny m*ks relation that is re-broadcast.
  */
object ProductQuant {

  /** Exact squared L2 distance as a sequential left-fold — the codegen'd
    * [[graft.functions.SqDist]] expression, bit-identical to the
    * interpreted `aggregate(zip_with(...))` form and to DuckDB's
    * list_sum left fold, so centroid argmins stay oracle-stable.
    */
  private def sqDist(a: Column, b: Column): Column =
    call_function("vec_sqdist", a, b)

  private def doubled(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** (vec_id, sub, sv): each vector split into m contiguous subvectors.
    * Row-local (map-only) — the explode happens before any exchange.
    */
  private def subvectors(d: DataFrame, m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    d.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $subDim + 1, $subDim))"))
        .as(Seq("sub", "sv")))
  }

  /** Subspace codebook seed: centroid j of subspace s is the s-th
    * subvector of corpus vector j (j < ks). m*ks rows — always broadcast.
    */
  private def seedCodebook(emb: DataFrame, m: Int, ks: Int, dim: Int): DataFrame =
    subvectors(doubled(emb).filter(col("vec_id") < ks), m, dim)
      .select(col("sub").as("cs"), col("vec_id").as("j"), col("sv").as("cv"))

  /** Codebook after `trainIters` Lloyd refinements of the seed. Each
    * iteration: E-step assigns every corpus subvector to its nearest
    * centroid (squared L2, centroid-id tiebreak); M-step replaces each
    * centroid with the per-dimension mean of its assigned subvectors,
    * computed as the same two-level hierarchical exact-order fold as
    * [[Similarity.centroidMeans]]: vec_id-ordered within each (subspace,
    * centroid, dimension, vec_id >> bucketShift) bucket, bucket-ordered
    * across bucket sums (double addition is order-dependent; a
    * hash-aggregate SUM would not reproduce across partitionings or
    * engines). The bucketing keeps the largest materialized list at
    * max(2^bucketShift, N / 2^bucketShift) — a popular centroid never
    * pulls its full assigned population into one group; bucketShift 0
    * (the default) derives the O(√N)-balancing shift from one cheap
    * count, an explicit shift pins the fold order for oracle-gated
    * callers. Centroids with no assignments survive unchanged via the
    * left join.
    */
  private[ops] def codebook(emb: DataFrame, m: Int, ks: Int, dim: Int,
      trainIters: Int, bucketShift: Int = 0): DataFrame = {
    val shift = Similarity.resolveShift(emb, bucketShift)
    var cb = seedCodebook(emb, m, ks, dim)
    for (_ <- 1 to trainIters) {
      val assigned = subvectors(doubled(emb), m, dim)
        .join(broadcast(cb), col("sub") === col("cs"))
        .withColumn("d2", sqDist(col("sv"), col("cv")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(struct(col("j"), col("sv")), struct(col("d2"), col("j"))).as("a"))
        .select(col("vec_id"), col("sub"), col("a.j").as("j"), col("a.sv").as("sv"))
      val means = assigned
        .select(col("vec_id"), shiftright(col("vec_id"), shift).as("bkt"),
          col("sub"), col("j"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("j"), col("pos"), col("bkt"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("arr"))
        .select(col("sub"), col("j"), col("pos"), col("bkt"),
          expr("aggregate(transform(arr, s -> s.x), 0D, (a, b) -> a + b)").as("bs"),
          size(col("arr")).cast("long").as("cnt"))
        .groupBy(col("sub"), col("j"), col("pos"))
        .agg(sort_array(collect_list(struct(col("bkt"), col("bs")))).as("barr"),
          sum(col("cnt")).as("n"))
        .select(col("sub"), col("j"), col("pos"),
          (expr("aggregate(transform(barr, t -> t.bs), 0D, (a, b) -> a + b)")
            / col("n")).as("c"))
        .groupBy(col("sub"), col("j"))
        .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("pcs"))
        .select(col("sub").as("ms"), col("j").as("mj"),
          expr("transform(pcs, s -> s.c)").as("mv"))
      cb = cb.join(means, col("cs") === col("ms") && col("j") === col("mj"), "left")
        .select(col("cs"), col("j"), coalesce(col("mv"), col("cv")).as("cv"))
    }
    cb
  }

  /** PQ encoding: (vec_id, sub, code) — for each of the m subspaces, the
    * id of the nearest codebook centroid (squared-L2, centroid-id
    * tiebreak). Long format (one row per code) so results stay scalar.
    *
    * Plan shape at scale: broadcast of the m*ks codebook, a map-side ks-way
    * fanout per subvector, and ONE hash aggregate (min_by with map-side
    * combine) — no window, no corpus shuffle beyond the aggregate's.
    */
  private def assignWith(emb: DataFrame, cb: DataFrame,
      m: Int, dim: Int): DataFrame =
    subvectors(doubled(emb), m, dim)
      .join(broadcast(cb), col("sub") === col("cs"))
      .withColumn("d2", sqDist(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("j"), struct(col("d2"), col("j"))).as("code"))
      .select(col("vec_id"), col("sub"), col("code").cast("int").as("code"))

  def pqAssign(emb: DataFrame, m: Int = 16, ks: Int = 64, dim: Int = 64,
      trainIters: Int = 1, bucketShift: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    assignWith(emb, codebook(emb, m, ks, dim, trainIters, bucketShift), m, dim)
  }

  /** ADC top-k: per query, exact distances from each query subvector to
    * every subspace centroid form an (m x ks) lookup table; a corpus
    * vector's approximate distance is the sum of its m looked-up entries.
    *
    * Plan shape at scale: the LUT (queries x m x ks rows) is broadcast, the
    * corpus side is the CODES table (m small ints per vector — the point
    * of PQ), scoring is a broadcast-hash join + one hash aggregate, and
    * ranking goes through the bounded-heap [[graft.functions.TopKByScore]]
    * — no window over the scored set, no shuffle of raw vectors.
    */
  def pqTopK(emb: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 16, ks: Int = 64, dim: Int = 64, trainIters: Int = 1,
      bucketShift: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    // ONE trained codebook feeds both the corpus assignment and the query
    // LUT: the two broadcast subtrees share the identical plan object, so
    // the Lloyd-iteration DAG materializes once (ReuseExchange), not once
    // per consumer.
    val cb = codebook(emb, m, ks, dim, trainIters, bucketShift)
    val codes = assignWith(emb, cb, m, dim)
    val lut = subvectors(doubled(queries), m, dim)
      .select(col("vec_id").as("q_id"), col("sub").as("qs"), col("sv").as("qsv"))
      .join(broadcast(cb), col("qs") === col("cs"))
      .withColumn("d2", sqDist(col("qsv"), col("cv")))
      .select(col("q_id"), col("qs"), col("j"), col("d2"))
    val scored = codes
      .join(broadcast(lut),
        col("sub") === col("qs") && col("code") === col("j") &&
          col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      // Fixed-order fold over the m partials: double addition is
      // order-dependent, and a hash-aggregate SUM would not be
      // reproducible across partitionings.
      .agg(sort_array(collect_list(struct(col("sub"), col("d2")))).as("arr"))
      .withColumn("adist",
        expr("aggregate(transform(arr, s -> s.d2), 0D, (a, b) -> a + b)"))
    scored
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.topK(k)(-col("adist"), col("vec_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(
        col("q_id"),
        col("col._2").as("n_id"),
        (col("pos") + 1).cast("int").as("rnk"),
        (-col("col._1")).as("adist"))
  }
}
