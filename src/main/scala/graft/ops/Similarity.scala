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

  /** (vec_id, v float[], nrm) with nrm the L2 norm. */
  def normalized(emb: DataFrame): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
  }

  /** All pairs with cosine >= threshold (exact; quadratic — use LSH buckets
    * to pre-filter at scale).
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val n = normalized(emb)
    val a = n.select(col("vec_id").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("i") < col("j"))
      .withColumn("cos", expr("vec_dot(va, vb)") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val n = normalized(emb)
    val q = normalized(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rnk"), col("cos"))
  }

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
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("c_id"))
    n.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("vec_dot(v, cv)") / (col("nrm") * col("cn")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
  }

  /** IVF search: probe the `nprobe` nearest cells per query, rank only the
    * candidates in those cells. Candidate generation is a broadcast of the
    * tiny codebook + an equi-join on cell — linear in corpus size, with
    * recall controlled by nprobe.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 4, cells: Int = 16): DataFrame = {
    val n = normalized(emb)
    val assigned = ivfAssign(emb, cells)
    val withCell = n.join(assigned, "vec_id")
    val cents = n.filter(col("vec_id") < cells)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val q = normalized(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("c_id"))
    val qCells = q.crossJoin(broadcast(cents))
      .withColumn("qcos", expr("vec_dot(qv, cv)") / (col("qn") * col("cn")))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("c_id").as("cell"))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    qCells.join(withCell, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      // (q_id, vec_id) is already unique: each vector lives in exactly one
      // cell and the probed cells per query are distinct.
      .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("rnk"), col("cos"))
  }

  /** Same-bucket candidate pairs — the ANN pre-filter at scale. */
  def lshCandidates(emb: DataFrame, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val b = lshBuckets(emb, numPlanes, dim)
    b.as("a").join(b.as("c"),
        col("a.bucket") === col("c.bucket") && col("a.vec_id") < col("c.vec_id"))
      .select(col("a.vec_id").as("i"), col("c.vec_id").as("j"), col("a.bucket").as("bucket"))
  }
}
