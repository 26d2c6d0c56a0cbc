package graft.ops

import graft.{SparkFixture, Tables}
import graft.functions.CdcChunks
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = Tables.t(spark, sf0001, "documents")

  // ---- Count-Min heavy hitters -------------------------------------------

  test("CMS: estimates dominate exact counts and top-k matches truth") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a b b c"), (2L, "a b c d"), (3L, "a a e")
    ).toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(d, depth = 4, width = 1024, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Exact top-3 with (count desc, token asc) tiebreak: a=7, b=3, c=2.
    assert(out.map(t => (t._1, t._2)).toSet == Set(("a", 7L), ("b", 3L), ("c", 2L)))
    // The CMS one-sided error guarantee.
    out.foreach { case (tok, n, est, over) =>
      assert(est >= n, s"$tok: est $est < exact $n")
      assert(over == est - n)
    }
  }

  test("CMS: a width-1 sketch collapses every token into one counter") {
    import spark.implicits._
    val d = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(d, depth = 2, width = 1, topK = 3).collect()
    // All 3 tokens hash to bucket 0 in both rows: every estimate is the
    // full stream count — the worst case the min-over-rows bounds.
    assert(out.length == 3)
    out.foreach(r => assert(r.getLong(2) == 3L))
  }

  test("CMS: fixture run is deterministic and integer-typed") {
    val a = Sketches.cmsHeavyHitters(docs).collect()
    val b = Sketches.cmsHeavyHitters(docs).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.length == 20)
    a.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  // ---- HyperLogLog card --------------------------------------------------

  test("HLL: register math matches a hand-computed single-row corpus") {
    import spark.implicits._
    val d = Seq((1L, "hello", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val Array(all, web) =
      Sketches.hllCard(d).collect().sortBy(_.getString(0))
    // One distinct text -> exactly one nonzero register in both rows,
    // and the union row equals the single source's sketch.
    for (r <- Seq(all, web)) {
      assert(r.getLong(1) == 1L)
      assert(r.getLong(3) == 1L)
    }
    assert(all.getLong(2) == web.getLong(2))
    // harm_num = 2^(50-rho) + 255 * 2^50 with rho = 49 - bitlen(rest).
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(md5hex.take(14), 16)
    val rest = h & ((1L << 48) - 1)
    val rho = if (rest == 0) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    assert(web.getLong(2) == (1L << (50 - rho)) + 255L * (1L << 50))
  }

  test("HLL: union row registers are the register-wise max of the sources") {
    val rows = Sketches.hllCard(docs).collect()
    val all = rows.find(_.getString(0) == "*ALL*").get
    val srcs = rows.filter(_.getString(0) != "*ALL*")
    // Union cardinality sanity: ALL's estimate numerator is no larger
    // than any single source's (more distincts -> smaller harmonic sum),
    // and its exact count equals the corpus distinct-text count.
    assert(srcs.forall(_.getLong(2) >= all.getLong(2)))
    assert(all.getLong(3) == docs.filter(col("text").isNotNull)
      .select(countDistinct(col("text"))).head().getLong(0))
    // Estimate quality at m=256: within 25% of truth on the fixture
    // (HLL sigma is ~1.04/sqrt(256) ~ 6.5%).
    val m = 256.0
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val est = alpha * m * m * math.pow(2.0, 50) / all.getLong(2).toDouble
    val exact = all.getLong(3).toDouble
    assert(math.abs(est - exact) / exact < 0.25, s"est $est vs exact $exact")
  }

  // ---- Content-defined chunking ------------------------------------------

  private def chunksOf(s: String, k: Int = 8, div: Int = 32): Seq[String] = {
    val arr = CdcChunks.compute(UTF8String.fromString(s), k, div)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("CDC: chunks concatenate back to the document") {
    val texts = docs.select(col("text")).collect().map(_.getString(0))
    texts.foreach { t =>
      val cs = chunksOf(t)
      assert(cs.mkString("") == t)
      assert(cs.forall(_.nonEmpty))
    }
  }

  test("CDC: shorter-than-k documents are one whole-text chunk") {
    assert(chunksOf("short") == Seq("short"))
    assert(chunksOf("") == Seq(""))
  }

  test("CDC: boundaries are content-local — a prefix edit leaves later chunks intact") {
    // Pick a fixture doc with at least 3 cuts so the property is
    // actually exercised (assert it, so a hash change fails loudly).
    val t = docs.select(col("text")).collect().map(_.getString(0))
      .find { s =>
        val cs = chunksOf(s)
        // >= 4 chunks, and the earliest preserved boundary (cuts land at
        // positions >= 8) before the suffix we compare on.
        cs.length >= 4 && cs.take(2).map(_.length).sum >= 8
      }.get
    val base = chunksOf(t)
    val edited = chunksOf("EDITED PREFIX " + t)
    // Every boundary inside t further than k-1 chars from the splice is
    // decided by an unchanged window, so the chunk lists share a suffix;
    // only the first chunk (and at most one more window-straddling cut)
    // may differ.
    assert(base.takeRight(2) == edited.takeRight(2))
    assert(edited.mkString("") == "EDITED PREFIX " + t)
  }

  test("CDC: supplementary code points chunk without splitting surrogate pairs") {
    val t = ("word 😀 more words here and more " * 4).trim
    val cs = chunksOf(t)
    assert(cs.mkString("") == t)
    cs.foreach { c =>
      assert(!Character.isLowSurrogate(c.head), "chunk starts mid surrogate pair")
      assert(!Character.isHighSurrogate(c.last), "chunk ends mid surrogate pair")
    }
  }

  test("CDC card: an exact duplicate document is fully chunk-deduplicated") {
    import spark.implicits._
    val body = ("alpha beta gamma delta epsilon zeta eta theta " * 6).trim
    val d = Seq((1L, body), (2L, body), (3L, "tiny")).toDF("doc_id", "text")
    val r = Dedup.cdcChunkCard(d).head()
    // The periodic body may repeat chunks WITHIN itself too — derive the
    // expected card from the chunk multiset, not from doc counts.
    val bodyChunks = chunksOf(body)
    val bodyBytes = body.getBytes("UTF-8").length.toLong
    val distinctBody = bodyChunks.distinct
    assert(r.getLong(0) == 3L)                                 // n_docs
    assert(r.getLong(1) == 2L * bodyChunks.length + 1)         // total_chunks
    assert(r.getLong(2) == distinctBody.length + 1L)           // distinct_chunks
    assert(r.getLong(3) == r.getLong(1) - r.getLong(2))        // dup_chunks
    assert(r.getLong(4) == 2L * bodyBytes + 4L)                // total_bytes
    assert(r.getLong(5) == r.getLong(4)
      - distinctBody.map(_.getBytes("UTF-8").length.toLong).sum - 4L) // dup_bytes
  }
}
