package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkFixture

/** Property tests for the r11 codegen kernels: each must be bit/value-
  * identical to the composed form it replaced, on arbitrary token
  * arrays — the kernels exist for speed, never for different answers.
  * Generators are sampled directly with fixed seeds (the
  * scalatest-scalacheck bridge is not in the offline cache), and the
  * reference computations are written independently (JVM BigInt/MD5 on
  * strings), not by calling the kernel twice.
  */
class KernelPropertySpec extends AnyFunSuite with SparkFixture {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1337L + i)))

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("the", "a", "über", "日本", "", "x'y", "a b")) // incl. empty + multibyte
  private val toks: Gen[Array[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, token).map(_.toArray))

  private def arrayData(ts: Array[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t).asInstanceOf[AnyRef]))

  private def md5Prefix(s: String, bytes: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until bytes).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
  }

  test("bigram_bucket_counts == per-occurrence md5 prefix mod buckets (150 samples)") {
    samples(toks, 150).foreach { ts =>
      val m = BigramBuckets.compute(arrayData(ts), 64)
      val got = (0 until m.numElements()).map(i =>
        m.keyArray.getLong(i) -> m.valueArray.getLong(i)).toMap
      val want = ts.sliding(2).filter(_.length == 2)
        .map(p => md5Prefix(p(0) + " " + p(1), 7) % 64)
        .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want, ts.mkString("[", ",", "]"))
    }
  }

  test("term_counts == filtered frequency map (150 samples)") {
    val termSet = new java.util.HashSet[UTF8String]()
    Seq("the", "a", "日本", "").foreach(t => termSet.add(UTF8String.fromString(t)))
    samples(toks, 150).foreach { ts =>
      val m = TermCounts.compute(arrayData(ts), termSet)
      val got = (0 until m.numElements()).map(i =>
        m.keyArray.getUTF8String(i).toString -> m.valueArray.getLong(i)).toMap
      val want = ts.filter(Set("the", "a", "日本", "").contains)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      assert(got == want, ts.mkString("[", ",", "]"))
    }
  }

  test("pair_counts == adjacent-pair frequency map (150 samples)") {
    samples(toks, 150).foreach { ts =>
      val m = PairCounts.compute(arrayData(ts))
      val got = (0 until m.numElements()).map(i =>
        m.keyArray.getUTF8String(i).toString -> m.valueArray.getLong(i)).toMap
      val want = ts.sliding(2).filter(_.length == 2)
        .map(p => p(0) + " " + p(1))
        .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want, ts.mkString("[", ",", "]"))
    }
  }

  test("hash_weight_sum == per-token md5 bucket weights (150 samples)") {
    samples(toks, 150).foreach { ts =>
      val got = HashWeightSum.compute(arrayData(ts), 1024)
      val want = ts.map(t => (md5Prefix(t, 4) % 1024) % 13 - 6).sum
      assert(got == want, ts.mkString("[", ",", "]"))
    }
  }

  test("vec_fold_sum == per-position sequential scalar fold, bit for bit (100 samples)") {
    val vec: Gen[Array[Double]] = Gen.listOfN(8,
      Gen.oneOf(Gen.chooseNum(-1e9, 1e9), Gen.oneOf(0.0, -0.0, 1e-300, -1e300)))
      .map(_.toArray)
    val vecs: Gen[Array[Array[Double]]] =
      Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, vec).map(_.toArray))
    samples(vecs, 100).foreach { vs =>
      val in = new GenericArrayData(
        vs.map(v => new GenericArrayData(v).asInstanceOf[AnyRef]))
      val got = VecFoldSum.compute(in).toDoubleArray()
      val want = Array.tabulate(if (vs.isEmpty) 0 else 8) { p =>
        vs.foldLeft(0.0)((a, v) => a + v(p)) // same +0.0 seed, same order
      }
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(java.lang.Double.doubleToRawLongBits(g) ==
          java.lang.Double.doubleToRawLongBits(w), s"$g vs $w")
      }
    }
  }

  test("FirstKBySeq == global sort-take under arbitrary partition splits (100 samples)") {
    val row: Gen[(Long, Long, String)] = for {
      ts <- Gen.chooseNum(0L, 50L) // small range forces seq ties
      id <- Gen.chooseNum(0L, 1000000L)
      s <- token
    } yield (ts, id, s)
    val rows: Gen[List[(Long, Long, String)]] =
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, row))
    val agg = new FirstKBySeq(5)
    samples(rows, 100).foreach { rs =>
      // Distinct ids make (seq, id) a total order, as the op requires.
      val distinct = rs.distinctBy(_._2)
      // Random 3-way split + per-partition reduce + merge in both orders.
      val parts = distinct.zipWithIndex.groupBy(_._2 % 3).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce)).toList
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      val mergedRev = parts.reverse.foldLeft(agg.zero)(agg.merge)
      val want = distinct.sortBy(t => (t._1, t._2)).take(5).map(_._3)
      assert(agg.finish(merged) == want)
      assert(agg.finish(mergedRev) == want)
    }
  }

  test("pq_code == independent min-by-sqdist argmin with smaller-id ties (100 samples)") {
    val cfg: Gen[(Int, Int, Int)] = for {
      m <- Gen.chooseNum(1, 4)
      ks <- Gen.chooseNum(1, 8)
      subDim <- Gen.chooseNum(1, 6)
    } yield (m, ks, subDim)
    // Coarse values make distance ties actually occur.
    val coarse: Gen[Double] = Gen.chooseNum(-2, 2).map(_.toDouble)
    samples(cfg, 100).zipWithIndex.foreach { case ((m, ks, subDim), i) =>
      val cb = samples(coarse, m * ks * subDim).toArray
      val sv = samples(coarse, subDim).toArray
      (0 until m).foreach { sub =>
        val got = PqCode.compute(sub,
          new GenericArrayData(sv.map(java.lang.Double.valueOf(_).asInstanceOf[AnyRef])),
          cb, ks, subDim)
        // Independent reference: same sequential fold, scala-side argmin.
        val want = (0 until ks).map { j =>
          val off = sub * ks * subDim + j * subDim
          var d = 0.0
          (0 until subDim).foreach { p => val x = sv(p) - cb(off + p); d += x * x }
          (d, j)
        }.minBy(identity)._2 // (d, j) lexicographic: ties keep smaller j
        assert(got == want, s"sample $i sub $sub")
      }
    }
  }

  test("bit_length_long == length(bin(x)) for positives, 0 at zero (SQL round-trip)") {
    GraftFunctions.register(spark)
    // Edge longs plus sampled positives: the kernel replaced the
    // string-allocating length(bin(x)) in the HLL rho path, so it must
    // agree with that composed form everywhere the sketch feeds it
    // (non-negative 56-bit remainders), and bit_length_long(0) = 0 is
    // the contract that folds the rho special case away.
    val edges = Seq(0L, 1L, 2L, 3L, 255L, 256L, (1L << 48) - 1, 1L << 48,
      (1L << 56) - 1, Long.MaxValue)
    val sampled = samples(Gen.chooseNum(1L, Long.MaxValue), 100)
    import spark.implicits._
    val rows = (edges ++ sampled).toDF("x")
      .selectExpr("x", "bit_length_long(x) AS got",
        "IF(x = 0, 0, length(bin(x))) AS want")
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2), s"x=${r.getLong(0)}"))
  }

  test("bit_length_long typed-pattern semantics: ints mask to 32 bits, negative longs read 64") {
    GraftFunctions.register(spark)
    // ADVICE r14: the registered SQL function is reachable by gateway
    // users with any input, so the negative domain is DEFINED, not
    // assumed away — the bit length of the input's two's-complement
    // pattern at its own width. An int input masks to its unsigned
    // 32-bit pattern (no sign-extension artifact); a negative long's
    // 64-bit pattern reads 64.
    val rows = spark.sql(
      """SELECT bit_length_long(CAST(-1 AS INT)) AS int_neg,
        |  bit_length_long(CAST(-2147483648 AS INT)) AS int_min,
        |  bit_length_long(CAST(5 AS INT)) AS int_pos,
        |  bit_length_long(CAST(-1 AS BIGINT)) AS long_neg,
        |  bit_length_long(CAST(NULL AS BIGINT)) AS nul""".stripMargin).collect()(0)
    assert(rows.getInt(0) == 32)
    assert(rows.getInt(1) == 32)
    assert(rows.getInt(2) == 3)
    assert(rows.getInt(3) == 64)
    assert(rows.isNullAt(4))
  }

  test("suffix_stats == brute-force LRS / distinct-k on arbitrary strings (200 samples)") {
    // Small alphabet so repeats actually occur; brute force checks every
    // length top-down with a substring set (overlaps included, exactly
    // the COUNT(*) > COUNT(DISTINCT) oracle definition).
    val txt: Gen[String] = for {
      n <- Gen.chooseNum(0, 60)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' '))
    } yield cs.mkString
    def brute(s: String, k: Int): (Long, Long, Long) = {
      val n = s.length
      val lrs = (n - 1 to 1 by -1).find { l =>
        val seen = scala.collection.mutable.HashSet[String]()
        (0 to n - l).exists(i => !seen.add(s.substring(i, i + l)))
      }.getOrElse(0).toLong
      val dk = if (n >= k) (0 to n - k).map(i => s.substring(i, i + k)).distinct.size.toLong else 0L
      (lrs, dk, math.max(0, n - k + 1).toLong)
    }
    for (k <- Seq(3, 16); s <- samples(txt, 100)) {
      val r = SuffixStats.compute(UTF8String.fromString(s), k)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == brute(s, k), s"k=$k text='$s'")
    }
  }

  test("suffix_stats handles edge shapes: empty, all-same, non-BMP code points") {
    def ss(s: String, k: Int) = {
      val r = SuffixStats.compute(UTF8String.fromString(s), k)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(ss("", 16) == (0L, 0L, 0L))
    assert(ss("x", 1) == (0L, 1L, 1L)) // one 1-gram, no repeat
    assert(ss("aaaa", 2) == (3L, 1L, 3L)) // overlapping "aaa" repeats
    assert(ss("abcab", 2) == (2L, 3L, 4L)) // "ab" twice; ab,bc,ca distinct
    // Positions are code points: a surrogate-pair emoji is ONE unit.
    assert(ss("😀x😀", 1) == (1L, 2L, 3L))
  }

  test("url_canonicalize applies every rule; non-URLs pass through") {
    def c(s: String) = UrlCanonicalize.compute(UTF8String.fromString(s)).toString
    // scheme+host lowering, www strip, default port, fragment, param
    // sort, tracking strip, trailing slash — all at once.
    assert(c("HTTPS://WWW.Ex.COM:443/a/b/?z=1&utm_source=x&a=2#f") ==
      "https://ex.com/a/b?a=2&z=1")
    assert(c("http://ex.com:80/") == "http://ex.com/")
    assert(c("http://ex.com:8080/p") == "http://ex.com:8080/p") // non-default kept
    assert(c("https://ex.com:80/p") == "https://ex.com:80/p") // 80 not https default
    assert(c("https://ex.com") == "https://ex.com/") // empty path -> root
    // Bare `ref` is KEPT (ADVICE r16: semantic on real sites — GitHub
    // ?ref=branch); fbclid is still stripped, survivors still sort.
    assert(c("https://ex.com?b=2&fbclid=x&ref=abc") == "https://ex.com/?b=2&ref=abc")
    assert(c("https://ex.com/p?spm=a.b&x=1") == "https://ex.com/p?spm=a.b&x=1")
    assert(c("https://ex.com/p?ref_src=twsrc&x=1") == "https://ex.com/p?x=1")
    assert(c("https://ex.com/p?utm_campaign=a&utm_b=c") == "https://ex.com/p") // all stripped
    assert(c("https://ex.com/p?&&a=1&") == "https://ex.com/p?a=1") // empty segments
    assert(c("https://ex.com/p?flag") == "https://ex.com/p?flag") // valueless non-tracking kept
    assert(c("https://ex.com/p?fbclid") == "https://ex.com/p") // valueless tracking stripped
    assert(c("not a url") == "not a url")
    assert(c("doc:12345") == "doc:12345") // no ://, opaque id stable
    // Userinfo is preserved verbatim; the host after the LAST '@' still
    // lowercases, www-strips and drops its default port.
    assert(c("https://User:Pw@WWW.Ex.COM:443/p") == "https://User:Pw@ex.com/p")
    assert(c("https://a@b@C.com/p") == "https://a@b@c.com/p")
    // IPv6: the port colon is the one after the bracket; hex lowercases.
    assert(c("https://[2001:DB8::1]:443/p") == "https://[2001:db8::1]/p")
    assert(c("http://[::1]:8080/p") == "http://[::1]:8080/p")
    assert(c("http://[::1]/p") == "http://[::1]/p")
    // Registry arity check (ADVICE r16): a second argument fails loudly
    // instead of being silently ignored.
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("https://x.com")
    val e = intercept[IllegalArgumentException](
      UrlCanonicalize.forArgs(Seq(lit, lit)))
    assert(e.getMessage.contains("url_canonicalize"))
    assert(UrlCanonicalize.forArgs(Seq(lit)).child == lit)
  }

  test("pq_code validates subvector length and subspace range with named errors") {
    val cb = Array(0.0, 1.0, 2.0, 3.0) // m=1, ks=2, subDim=2
    val short = new GenericArrayData(Array[AnyRef](java.lang.Double.valueOf(0.0)))
    val e1 = intercept[IllegalArgumentException](PqCode.compute(0, short, cb, 2, 2))
    assert(e1.getMessage.contains("subvector"))
    val ok = new GenericArrayData(
      Array[AnyRef](java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(1.0)))
    val e2 = intercept[IllegalArgumentException](PqCode.compute(1, ok, cb, 2, 2))
    assert(e2.getMessage.contains("out of range"))
    assert(PqCode.compute(0, ok, cb, 2, 2) == 0)
  }
}
