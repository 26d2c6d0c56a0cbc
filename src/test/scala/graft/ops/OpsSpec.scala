package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.Tables

/** Invariant checks for the pipeline operators. Exact-output correctness is
  * covered by the DuckDB oracle corpus (queries/PipelineOps + Verify); these
  * pin structural properties and edge cases.
  */
class OpsSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = Tables.t(spark, sf0001, "documents")
  private lazy val emb = Tables.t(spark, sf0001, "embeddings")

  test("exact dedup keeps exactly one id per distinct content hash") {
    val distinctHashes = docs.select(md5(col("text"))).distinct().count()
    assert(Dedup.exactKeep(docs).count() == distinctHashes)
    val stats = Dedup.exactStats(docs)
    assert(stats.agg(sum("n_dups")).head.getLong(0) == docs.count())
  }

  test("jaccard pairs are symmetric-free (i < j) and within [0,1]") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
  }

  test("minhash signature has one row per eligible doc, 8 hash columns") {
    val sig = Dedup.minhashSignature(docs)
    assert(sig.columns.toSet == (Set("doc_id") ++ (0 until 8).map(i => s"h$i")))
    assert(sig.count() == docs.filter(size(split(col("text"), " ")) >= 3).count())
  }

  test("LSH candidates cover the high-jaccard pairs (recall of banding)") {
    val trueDups = Dedup.ngramJaccardPairs(docs, 3, 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashLshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(trueDups.subsetOf(cands),
      s"missed: ${trueDups.diff(cands).take(5)}")
  }

  test("simhash fits in 32 bits and is deterministic") {
    val s1 = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("cosine near-dup pairs stay within [-1,1] and i<j") {
    val pairs = Similarity.nearDupPairs(emb, 0.3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("brute-force top-k returns k ranked neighbors per query, no self") {
    val q = emb.filter(col("vec_id") < 3)
    val top = Similarity.bruteForceTopK(emb, q, 4).collect()
    assert(top.length == 3 * 4)
    assert(top.forall(r => r.getLong(0) != r.getLong(1)))
    val ranks = top.groupBy(_.getLong(0)).values.map(_.map(_.getInt(2)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3, 4)))
  }

  test("LSH buckets land in [0, 2^planes)") {
    val b = Similarity.lshBuckets(emb, 8, 64).collect()
    assert(b.length == emb.count())
    assert(b.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
  }

  test("rolling_hash matches the reference JVM implementation") {
    import graft.functions.RollingHash
    assert(RollingHash.hash("") == 0L)
    assert(RollingHash.hash("a") == 'a'.toLong)
    assert(RollingHash.hash("ab") == ('a'.toLong * 31 + 'b'.toLong) % RollingHash.Mod)
    val fp = TextOps.fingerprints(spark, docs).collect()
    assert(fp.forall(r => r.getLong(1) >= 0 && r.getLong(1) < RollingHash.Mod))
  }

  test("langid predicts a language for every doc") {
    val out = TextOps.langId(docs).collect()
    assert(out.length == docs.count())
    assert(out.forall(r => Set("en", "fr", "es", "de", "zh").contains(r.getString(5))))
  }

  test("multimodal stub extracts typed metadata per payload") {
    val meta = Multimodal.extractMeta(spark, Multimodal.fromDocuments(docs))
    assert(meta.columns.toSeq ==
      Seq("doc_id", "byte_len", "width", "height", "channels", "fingerprint"))
    val rows = meta.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.getInt(2) >= 1))
    assert(rows.forall(_.getString(5).length == 32))
  }
}
