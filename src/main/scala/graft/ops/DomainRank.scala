package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Domain-graph centrality for crawl prioritization — the PageRank pass a
  * web-scale curation pipeline runs over the host/domain link graph to
  * decide crawl frequency and per-domain quality priors (Common Crawl
  * publishes exactly this artifact as its host-level ranking; the
  * reference engine has no graph surface, so this is beyond-reference
  * depth in the pipeline family).
  *
  * Scale shape — the whole point of ranking DOMAINS rather than pages:
  * the corpus is touched ONCE, by a single hash aggregate that collapses
  * the per-document out-link multiset to (src_domain, tgt_domain, cnt) —
  * bounded by domains² rows no matter how many documents contributed, so
  * at 100 TB the iteration input is still a few thousand rows. The T
  * power-iteration steps then run on that provably bounded relation via
  * one `collect()` (the same bounded-by-construction driver path as the
  * BPE merge table and the union-find fast path: the bound is domains²,
  * a parameter, never corpus size) and the final (domain, pr_rank) vector —
  * `domains` rows — is parallelized back.
  *
  * Determinism: ranks are integer fixed-point. Each edge's contribution
  * is floor(85 * pr(src) / (100 * outdeg(src))) — floor division on
  * non-negative longs — multiplied by the edge count; sums of integers
  * are order-independent, so any engine that replays the same floor
  * arithmetic reproduces the ranks bit-for-bit (the oracle unrolls the
  * iterations as chained CTEs with DuckDB's `//`). No float appears
  * anywhere, including the damping factor (85/100 kept as integers).
  */
object DomainRank {

  /** Per-document out-links, synthesized deterministically from row
    * arithmetic (the p47/p91 fixture pattern — the tables ship no link
    * column, so the fixture derives a reproducible graph any engine can
    * replay): src domain = h56(doc_id) % domains, and `fanout` targets
    * h56(doc_id + ":" + j) % domains, self-loops dropped.
    */
  def syntheticEdges(docs: DataFrame, domains: Int, fanout: Int): DataFrame = {
    val src = Sampling.h56(col("doc_id")) % domains
    docs
      .select(col("doc_id"), src.as("src"),
        explode(array((1 to fanout).map(lit): _*)).as("j"))
      .withColumn("tgt",
        Sampling.h56(concat(col("doc_id").cast("string"), lit(":"), col("j").cast("string")))
          % domains)
      .filter(col("src") =!= col("tgt"))
      .select(col("src"), col("tgt"))
  }

  /** (domain, out_edges, rank) for every domain in [0, domains), after
    * `iters` damped power-iteration steps at fixed-point `scale`.
    */
  def domainRank(docs: DataFrame, domains: Int = 64, fanout: Int = 3,
                 iters: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    require(domains > 0 && fanout > 0 && iters >= 0, "need positive graph parameters")
    val spark = docs.sparkSession
    // ONE corpus scan: hash-aggregate the link multiset to the bounded
    // (src, tgt, cnt) relation (<= domains^2 rows, map-side combined).
    val edges = syntheticEdges(docs, domains, fanout)
      .groupBy("src", "tgt").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val outDeg = new Array[Long](domains)
    edges.foreach { case (s, _, c) => outDeg(s.toInt) += c }
    val base = 15L * scale / (100L * domains)
    var pr = Array.fill(domains)(scale / domains)
    for (_ <- 1 to iters) {
      val next = Array.fill(domains)(base)
      edges.foreach { case (s, t, c) =>
        next(t.toInt) += c * (85L * pr(s.toInt) / (100L * outDeg(s.toInt)))
      }
      pr = next
    }
    val rows = (0 until domains).map(d =>
      Row(d.toLong, outDeg(d), pr(d)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("domain", LongType, nullable = false),
        StructField("out_edges", LongType, nullable = false),
        StructField("pr_rank", LongType, nullable = false))))
  }
}
