package graft.ops

import org.apache.spark.sql.expressions.Window
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

  test("jaccard pairs leave no cached blocks behind (gateway sessions must not accumulate)") {
    // The shared docData subtree is deduplicated by ReuseExchange within
    // the single action, not by persist() — so after the action completes
    // there is NO block-manager state for a long-lived session to leak.
    spark.catalog.clearCache()
    Dedup.ngramJaccardPairs(docs, 3, 0.8).collect()
    CorpusSignals.cooccurrenceLift(docs).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(","))
    // And the reuse actually fires — the aggregate is not recomputed per
    // branch (four consumers, three ReusedExchange nodes).
    val df = Dedup.ngramJaccardPairs(docs, 3, 0.8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan.linesIterator.take(8).mkString("\n"))
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

  test("asof join: nulls exactly for keys with no earlier right row") {
    val events = Tables.t(spark, sf0001, "events").select("event_id", "user_id", "ts")
    val orders = Tables.t(spark, sf0001, "orders")
    val joined = AsOf.join(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    assert(joined.count() == events.count())
    val custsWithOrders = orders.select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    joined.select("user_id", "_asof_o_orderkey").collect().foreach { r =>
      val matched = !r.isNullAt(1)
      assert(matched == custsWithOrders.contains(r.getLong(0)),
        s"user ${r.getLong(0)}: matched=$matched")
    }
    // Every event user has orders in the testdata, so force the null branch:
    // drop low custkeys from the right side and check exactly those users
    // come back unmatched.
    val restricted = AsOf.join(events, orders.filter(col("o_custkey") >= 50),
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
    restricted.select("user_id", "_asof_o_orderkey").collect().foreach { r =>
      assert(r.isNullAt(1) == (r.getLong(0) < 50), s"user ${r.getLong(0)}")
    }
  }

  test("approx sketches land within tolerance of exact answers") {
    val li = Tables.t(spark, sf0001, "lineitem")
    val exactParts = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exactParts).toDouble / exactParts < 0.1,
      s"approx=$approx exact=$exactParts")
    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val sketched = li.select(expr("approx_percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    assert(math.abs(sketched - exactMedian) / exactMedian < 0.05)
  }

  test("multimodal metadata comes from real header bytes; md5 fingerprint is real") {
    val meta = Multimodal.extractMeta(spark,
      MediaHeaders.synthesizeContainers(spark, docs))
    assert(meta.columns.toSeq ==
      Seq("doc_id", "fmt", "byte_len", "width", "height", "channels", "fingerprint"))
    val rows = meta.collect()
    assert(rows.length == docs.count())
    // Parsed from actual container bytes: format cycles on doc_id, and the
    // byte length is the format's exact header size.
    rows.foreach { r =>
      val expectFmt = (r.getLong(0) % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "jpeg"; case _ => "mp4"
      }
      assert(r.getString(1) == expectFmt)
      assert(r.getLong(2) == (expectFmt match {
        case "png" => 33L; case "gif" => 13L; case "jpeg" => 21L; case _ => 280L
      }))
      val expectChannels = if (expectFmt == "mp4") 1 else 3
      assert(r.getInt(3) >= 1 && r.getInt(4) >= 1 && r.getInt(5) == expectChannels)
    }
    // Fingerprint is the true md5 of the payload bytes.
    val png = MediaHeaders.synthPng(17, 9)
    val one = Multimodal.extractMeta(spark,
      spark.createDataFrame(Seq((1L, png))).toDF("doc_id", "payload")).head
    assert(one.getString(6) == Multimodal.md5Hex(png))
    assert(one.getInt(3) == 17 && one.getInt(4) == 9)
    // Non-container bytes report unknown, never fabricated dimensions.
    val unk = Multimodal.extractMeta(spark, Multimodal.fromDocuments(docs)).head
    assert(unk.getString(1) == "unknown" && unk.getInt(3) == -1)
  }

  test("hash sampling is deterministic, near-fraction, and stable under growth") {
    val s1 = Sampling.hashSample(docs, 0.2, col("doc_id"))
    val s2 = Sampling.hashSample(docs, 0.2, col("doc_id"))
    val ids = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == s2.select("doc_id").collect().map(_.getLong(0)).toSet)
    val frac = ids.size.toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction $frac far from 0.2")
    // Growth stability: sampling a SUBSET picks exactly the intersection —
    // a doc's membership cannot depend on what else is in the corpus.
    val subsetIds = Sampling.hashSample(docs.filter(col("doc_id") < 100), 0.2, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(subsetIds == ids.filter(_ < 100))
    // Splits partition the corpus with the expected skew.
    val splits = Sampling.splitAssign(docs, col("doc_id"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == docs.count())
    assert(splits("train") > splits.getOrElse("validation", 0L))
    // Stratified: exactly min(k, stratum size) rows per stratum.
    val strat = Sampling.stratifiedSample(docs, col("source"), 5, col("doc_id"))
    val perSource = strat.groupBy("source").count().collect()
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.forall(r => r.getLong(1) == math.min(5L, sizes(r.getString(0)))))
  }

  test("ngram_shingles equals the composed split/sequence/slice form") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // Edge shapes: empty, single word, exact n, consecutive/leading/
    // trailing spaces (empty tokens!), unicode, long text.
    val texts = Seq("", "one", "a b", "a b c", "a b c d", "  a b", "a  b c ",
      "é ü 漢 字 x", ("w " * 500).trim)
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val custom = df.selectExpr(s"ngram_shingles(text, $n) AS s").collect()
      val composed = df.selectExpr(
        s"""CASE WHEN size(split(text, ' ')) >= $n
           |THEN transform(sequence(0, size(split(text, ' ')) - $n),
           |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, $n)))
           |ELSE array() END AS s""".stripMargin).collect()
      custom.zip(composed).zipWithIndex.foreach { case ((c, e), i) =>
        assert(c.getSeq[String](0) == e.getSeq[String](0),
          s"mismatch for n=$n text='${texts(i)}'")
      }
    }
  }

  test("range join equals the theta join, including fractional-second range ends") {
    import spark.implicits._
    // Boundary regression: window [10:00:00.500, 11:00:00.500) with an
    // event at 11:00:00.200 — inside the window but in the bucket AFTER
    // the window's truncated end-second. Seconds-truncated bucketing
    // dropped this pair.
    val points = Seq(
      (1L, 7L, "2024-01-01 11:00:00.200"),
      (2L, 7L, "2024-01-01 10:30:00.000"),
      (3L, 7L, "2024-01-01 11:00:00.600"), // past the end: must NOT match
      (4L, 8L, "2024-01-01 10:30:00.000")) // other key: must NOT match
      .toDF("event_id", "user_id", "ts_s")
      .select(col("event_id"), col("user_id"), col("ts_s").cast("timestamp").as("ts"))
    val ranges = Seq((100L, 7L, "2024-01-01 10:00:00.500", "2024-01-01 11:00:00.500"))
      .toDF("range_id", "r_user", "s_s", "e_s")
      .select(col("range_id"), col("r_user"),
        col("s_s").cast("timestamp").as("w_start"),
        col("e_s").cast("timestamp").as("w_end"))
    val out = RangeJoin.pointInRange(points, ranges,
      "user_id", "r_user", "ts", "w_start", "w_end", granularitySec = 3600L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
    // Inverted range -> zero buckets, zero rows (not a descending-sequence
    // explosion joined and filtered away).
    val inverted = ranges.select(col("range_id"), col("r_user"),
      col("w_end").as("w_start"), col("w_start").as("w_end"))
    assert(RangeJoin.pointInRange(points, inverted,
      "user_id", "r_user", "ts", "w_start", "w_end", 3600L).isEmpty)
    // And over real data: identical rows to the plain theta join.
    val events = Tables.t(spark, sf0001, "events")
    val pts = events.select(col("event_id"), col("user_id"), col("ts"))
    val wins = events.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"), col("user_id").as("p_user"),
      col("ts").as("w_start"), (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val bucketed = RangeJoin.pointInRange(pts, wins,
      "user_id", "p_user", "ts", "w_start", "w_end", 3600L)
      .select(col("event_id"), col("purchase_id"))
    val theta = pts.join(wins,
      pts("user_id") === wins("p_user") &&
        pts("ts") >= wins("w_start") && pts("ts") < wins("w_end"))
      .select(col("event_id"), col("purchase_id"))
    assert(bucketed.exceptAll(theta).isEmpty && theta.exceptAll(bucketed).isEmpty)
  }

  test("salted join equals the plain join; salt spreads a hot key") {
    val events = Tables.t(spark, sf0001, "events")
    val dim = Tables.t(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val plain = events.join(dim, events("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("c_nationkey"))
    val salted = Skew.saltedJoin(events, dim, "user_id", "c_custkey",
      col("event_id"), factor = 8)
      .select(col("event_id"), col("c_nationkey"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // The salt actually spreads rows: a single key maps to several salts.
    val spread = events.filter(col("user_id") === events.select("user_id").head.getLong(0))
      .select(Skew.salt(col("event_id"), 8).as("s")).distinct().count()
    assert(spread > 1)
  }

  test("dedup clusters: edge endpoints share a cluster, labels are cluster minima") {
    val pairs = Dedup.minhashLshCandidates(docs)
    val cc = DedupClusters.connectedComponents(docs, pairs)
    val label = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every doc labelled; every edge endpoint pair agrees.
    assert(label.size == docs.count())
    pairs.collect().foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)))
    }
    // Each label is the minimum member of its own cluster, and a member.
    label.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
    // The distributed label-propagation path (forced via driverEdgeLimit=0)
    // resolves the identical components as the driver union-find fast path.
    val ccDist = DedupClusters.connectedComponents(docs, pairs, driverEdgeLimit = 0L)
    assert(ccDist.exceptAll(cc).isEmpty && cc.exceptAll(ccDist).isEmpty)
  }

  test("cc fast-path collect is one job and never touches the session conf") {
    val key = "spark.sql.limit.initialNumPartitions"
    // getOption surfaces the registered default ("1") even when unset —
    // the leak check below is value-unchanged, not key-absent.
    val before = spark.conf.getOption(key)
    assert(!before.contains(Int.MaxValue.toString), "precondition: not pinned")
    // 8-partition no-shuffle edge relation with fewer rows than the cap:
    // the bounded limit(cap+1) cannot stop early, so without the pinned
    // initial partition count the collect ramps 1 -> 4 -> 8 partitions
    // across several jobs; pinned, it is exactly one.
    val edges = spark.range(0, 200, 1, 8)
      .selectExpr("id as i", "id + 1 as j")
    val nodes = spark.range(0, 201).selectExpr("id as doc_id")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val cc = DedupClusters.connectedComponents(nodes, edges)
      // Listener events post asynchronously: wait for the first job event,
      // then a settling beat to catch any extra ramp-up jobs.
      val deadline = System.nanoTime() + 5_000_000_000L
      while (jobs < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(jobs == 1, s"fast-path probe launched $jobs jobs, expected 1")
      // One chain 0-1-...-200: every node labels to 0.
      assert(cc.filter(col("cluster_id") =!= 0L).isEmpty)
    } finally spark.sparkContext.removeSparkListener(listener)
    // The pin lives on a thread-local clone; the shared session conf (and
    // any session cloned from it, as the gateway does per request) must
    // never observe the value.
    assert(spark.conf.getOption(key) == before, "session conf leaked the pin")
    assert(!spark.newSession().conf.getOption(key).contains(Int.MaxValue.toString),
      "cloned session inherited the pin")
  }

  test("quantized ANN recovers most of the exact top-k") {
    val q = emb.filter(col("vec_id") < 4)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, 10))
    val quant = pairs(Similarity.quantizedTopK(emb, q, 10))
    val overlap = (exact & quant).size.toDouble / exact.size
    assert(overlap >= 0.5, s"int8 recall vs exact top-10 too low: $overlap")
  }

  test("bloom-prefiltered decontam equals the plain join, even with a saturated sketch") {
    val bench = Sampling.hashSample(docs, 0.1, col("doc_id"))
    val plain = Decontamination.ngramOverlap(docs, bench, 5, 2)
    val bloomed = Decontamination.ngramOverlapBloom(docs, bench, 5, 2)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    // An undersized sketch (expectedItems=1 => near-100% false positives)
    // must still give the exact answer: the join re-verifies candidates.
    val saturated = Decontamination.ngramOverlapBloom(docs, bench, 5, 2,
      expectedItems = 1L, fpp = 0.5)
    assert(saturated.exceptAll(plain).isEmpty && plain.exceptAll(saturated).isEmpty)
  }

  test("chunking covers every token exactly once per window position") {
    val chunks = CorpusSignals.chunk(docs, 64, 48)
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.collect().groupBy(_.getLong(0))
    assert(byDoc.keySet == toks.keySet) // every doc chunked, even short ones
    byDoc.foreach { case (id, rows) =>
      val n = toks(id)
      val expected = (math.max(n - 64, 0) + 47) / 48 + 1
      assert(rows.length == expected, s"doc $id: ${rows.length} chunks, want $expected")
      val idx = rows.map(_.getLong(1)).sorted
      assert(idx.sameElements(0L until expected)) // contiguous chunk indices
      rows.foreach { r => // every chunk is the real slice length
        val len = math.min(64, n - r.getLong(1) * 48)
        assert(r.getLong(2) == len)
      }
    }
  }

  test("repetition signals: constructed repeats produce the expected counts") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b"),        // top word 3x, 2-grams: [a a, a a, a b] -> 1 dup
      (2L, "x y"),            // no repetition
      (3L, "w")               // single token: zero 2-grams
    ).toDF("doc_id", "text")
    val got = CorpusSignals.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((4L, 3L, 3L, 1L)))
    assert(got(2L) == ((2L, 1L, 1L, 0L)))
    assert(got(3L) == ((1L, 1L, 0L, 0L)))
  }

  test("distributed global ntile/rowNumber match the single-reducer window forms") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.t(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val order = Seq(col("o_totalprice"), col("o_orderkey"))
    for (buckets <- Seq(4, 7)) {
      val dist = GlobalRank.ntile(orders, buckets, order, "q")
        .select(col("o_orderkey"), col("q"))
      val window = orders.select(col("o_orderkey"),
        ntile(buckets).over(Window.orderBy(order: _*)).as("q"))
      assert(dist.exceptAll(window).isEmpty && window.exceptAll(dist).isEmpty,
        s"ntile($buckets) mismatch")
    }
    val distRn = GlobalRank.rowNumber(orders, order, "rn")
      .select(col("o_orderkey"), col("rn"))
    val windowRn = orders.select(col("o_orderkey"),
      row_number().over(Window.orderBy(order: _*)).cast("long").as("rn"))
    assert(distRn.exceptAll(windowRn).isEmpty && windowRn.exceptAll(distRn).isEmpty)
    // The point of the op: no empty-frame global window in the data path.
    val plan = GlobalRank.ntile(orders, 4, order, "q")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [ntile"))
    // Distributed prefix sum equals the single-reducer running-sum window.
    val longs = orders.select(col("o_orderkey"),
      (col("o_orderkey") % 7).as("v"))
    val distCum = GlobalRank.prefixSum(longs, Seq(col("o_orderkey")), col("v"), "c")
      .select(col("o_orderkey"), col("c"))
    val winCum = longs.select(col("o_orderkey"),
      sum(col("v")).over(Window.orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("c"))
    assert(distCum.exceptAll(winCum).isEmpty && winCum.exceptAll(distCum).isEmpty)
  }

  test("ntileByValue matches the window NTILE, including rows with a NULL value") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = ((1L to 40L).map(i => (i, Some(i % 5))) ++
      Seq((41L, None), (42L, None), (43L, None))).toDF("id", "v")
    // Both arithmetic paths: the general prefixSum machinery AND the r15
    // boundedValues single-window prefix — each re-implements the bucket
    // formula, so each must independently match the window NTILE
    // (including the NULL value group and a tot % buckets != 0 split).
    for (buckets <- Seq(3, 4); bounded <- Seq(false, true)) {
      val dist = GlobalRank.ntileByValue(rows, buckets, col("v"), col("id"), "q",
          boundedValues = bounded)
        .select(col("id"), col("q"))
      val window = rows.select(col("id"),
        ntile(buckets).over(Window.orderBy(col("v"), col("id"))).as("q"))
      assert(dist.count() == 43L, "null-valued rows must not be dropped")
      assert(dist.exceptAll(window).isEmpty && window.exceptAll(dist).isEmpty,
        s"ntileByValue($buckets, bounded=$bounded) mismatch")
    }
  }

  test("pq: m codes per vector in [0, ks); seed codebook vectors encode themselves") {
    // Codes stay well-formed under the trained (default) codebook.
    val codes = ProductQuant.pqAssign(emb).collect()
    val perVec = codes.groupBy(_.getLong(0))
    assert(perVec.values.forall(_.length == 16))
    assert(codes.forall { r => val c = r.getInt(2); c >= 0 && c < 64 })
    // Under the UNTRAINED seed, a codebook vector's subvector is its own
    // nearest centroid (d2 = 0, id tiebreak) — vectors 0..63 encode as
    // themselves. Training moves centroids to cluster means, so this is
    // a seed-only invariant.
    val seed = ProductQuant.pqAssign(emb, trainIters = 0).collect()
    assert(seed.filter(_.getLong(0) < 64).forall(r => r.getInt(2) == r.getLong(0)))
  }

  test("pq training reduces total quantization error (Lloyd monotonicity)") {
    val d = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val sub = d.select(col("vec_id"),
      posexplode(expr("transform(sequence(0, 15), s -> slice(v, s * 4 + 1, 4))"))
        .as(Seq("sub", "sv")))
    def qerr(iters: Int): Double = sub
      .join(broadcast(ProductQuant.codebook(emb, 16, 64, 64, iters)),
        col("sub") === col("cs"))
      .withColumn("d2",
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"))
      .groupBy(col("vec_id"), col("sub")).agg(min(col("d2")).as("md"))
      .agg(sum(col("md"))).collect()(0).getDouble(0)
    val (untrained, trained) = (qerr(0), qerr(1))
    // Each Lloyd iteration is non-increasing in total assignment error;
    // on real data the drop is strict and substantial.
    assert(trained <= untrained,
      s"trained error $trained > untrained $untrained")
    assert(trained < untrained * 0.999,
      s"training had no measurable effect: $trained vs $untrained")
  }

  test("pq ADC top-k recovers a usable share of the exact L2 top-k") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 8)
    val pq = ProductQuant.pqTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    // Exact squared-L2 top-5 per query (same metric ADC approximates).
    val d = emb.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = d.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = d.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val overlaps = exact.keys.toSeq.map { qid =>
      val e = exact(qid).map(_._2).toSet
      val p = pq.getOrElse(qid, Array.empty).map(_._2).toSet
      (e intersect p).size.toDouble / 5
    }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.4, s"mean ADC recall@5 vs exact L2 = $mean (trained codebook)")
  }

  test("boilerplate passage dedup removes shared chunks, keeps unique ones in order") {
    import spark.implicits._
    // 5 docs share the chunk "aa bb cc" (> maxDocs=3); tails are unique.
    val shared = (0 until 5).map(i => (i.toLong, s"aa bb cc u$i v$i w$i"))
    val solo = Seq((90L, "zz yy xx pp qq rr"), (91L, "aa bb cc aa bb cc"))
    val docs = (shared ++ solo).toDF("doc_id", "text")
    val out = Boilerplate.removeSharedPassages(docs, 3, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    shared.foreach { case (id, _) =>
      assert(out(id) == ((1L, 1L, s"u$id v$id w$id")), s"doc $id: ${out(id)}")
    }
    assert(out(90L) == ((2L, 0L, "zz yy xx pp qq rr")))
    // Doc 91 is pure boilerplate (the shared chunk twice): everything goes.
    assert(out(91L) == ((0L, 2L, "")))
  }

  test("keep-first chunk dedup keeps exactly one global copy of every chunk") {
    import spark.implicits._
    // Chunk "aa bb cc" occurs in docs 1 (cid 0), 2 (cid 1), and twice in 3:
    // only doc 1's copy — the global (doc_id, cid) minimum — survives.
    val docs = Seq(
      (1L, "aa bb cc u1 v1 w1"),
      (2L, "u2 v2 w2 aa bb cc"),
      (3L, "aa bb cc aa bb cc"),
      (4L, "zz yy xx")).toDF("doc_id", "text")
    val out = Boilerplate.dedupChunksKeepFirst(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 0L, "aa bb cc u1 v1 w1")))
    assert(out(2L) == ((1L, 1L, "u2 v2 w2")))
    // Doc 3 is two copies of the already-claimed chunk: everything goes.
    assert(out(3L) == ((0L, 2L, "")))
    assert(out(4L) == ((1L, 0L, "zz yy xx")))
    // Corpus-wide invariant: total kept chunks == distinct chunks (one
    // survivor each), and kept + removed == total chunk count.
    assert(out.values.map(_._1).sum == 4L)
    assert(out.values.map(v => v._1 + v._2).sum == 7L)
  }

  test("media headers: real byte-level parse of png/gif/jpeg/wav containers") {
    assert(MediaHeaders.parse(1L, MediaHeaders.synthPng(640, 480))
      == ContainerMeta(1L, "png", 640, 480, 3))
    assert(MediaHeaders.parse(2L, MediaHeaders.synthGif(320, 240))
      == ContainerMeta(2L, "gif", 320, 240, 3))
    assert(MediaHeaders.parse(3L, MediaHeaders.synthJpeg(1024, 768))
      == ContainerMeta(3L, "jpeg", 1024, 768, 3))
    assert(MediaHeaders.parse(4L, MediaHeaders.synthWav(44100, 16, 2))
      == ContainerMeta(4L, "wav", 44100, 16, 2))
    // The JPEG walk must skip leading non-frame segments (APP0 etc.).
    val jfif = {
      val sof = MediaHeaders.synthJpeg(99, 77).drop(2) // strip SOI
      val app0 = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte)
      Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ sof
    }
    assert(MediaHeaders.parse(5L, jfif) == ContainerMeta(5L, "jpeg", 99, 77, 3))
    // Arbitrary text bytes sniff as unknown, not as a false positive.
    assert(MediaHeaders.parse(6L, "the quick brown fox jumps over it".getBytes("UTF-8")).fmt
      == "unknown")
    // Truncated signatures don't crash the parser.
    assert(MediaHeaders.parse(7L, Array[Byte](0x89.toByte, 'P')).fmt == "unknown")
  }

  test("mp4 box walk: tkhd dims, trak count, and the REAL stsz frame count") {
    val mp4 = MediaHeaders.synthMp4(1280, 720, 37)
    // tkhd 16.16-fixed dims and the single-trak count via the moov walk.
    assert(MediaHeaders.parse(8L, mp4) == ContainerMeta(8L, "mp4", 1280, 720, 1))
    // The frame count is read back from the stsz box, not derived.
    assert(MediaHeaders.mp4SampleCount(mp4).contains(37L))
    // Every box size is the true nested length: the payload ends exactly
    // where the last box says it does, so a conforming walker sees no
    // trailing garbage and a truncated copy fails the walk safely.
    assert(MediaHeaders.mp4SampleCount(mp4.dropRight(1)).isEmpty)
    assert(MediaHeaders.parse(9L, mp4.take(20)).fmt == "unknown")
    // sampleFrames consumes the stsz count for mp4 payloads: 37 frames at
    // step 5 -> indices 0,5,...,35.
    import spark.implicits._
    val frames = Multimodal.sampleFrames(spark,
      spark.createDataFrame(Seq((8L, mp4))).toDF("doc_id", "payload"), 5)
    assert(frames.select("frame_idx").collect().map(_.getInt(0)).sorted.toSeq
      == (0 to 35 by 5).toSeq)
  }

  test("rank-quantile band: integer cutoffs at ceil(p*n) and band filter") {
    import spark.implicits._
    val vals = (1 to 100).map(_.toLong).toDF("x")
    val cuts = Quantiles.rankCutoffs(vals, col("x"), 0.05, 0.95).head
    assert(cuts.getLong(0) == 5L && cuts.getLong(1) == 95L)
    val kept = Quantiles.outlierFilter(vals, col("x"), 0.05, 0.95)
      .collect().map(_.getLong(0)).sorted
    assert(kept.head == 5L && kept.last == 95L && kept.length == 91)
  }

  test("simhash pair plan is candidate->verify: no cartesian / nested-loop join") {
    val plan = Dedup.simhashPairs(docs, 6).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // The >7 fallback keeps the exact contract instead of throwing: at the
    // max distance every pair qualifies, giving exactly C(n,2) rows.
    import spark.implicits._
    val tiny = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "ee ff"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashPairs(tiny, 32).count() == 3L)
    // Cross-validation at the pigeonhole boundary: maxDist=8 takes the
    // all-pairs fallback; re-filtering its exact distances to <= 7 must
    // reproduce the banded candidate->verify path's output row-for-row.
    val banded7 = Dedup.simhashPairs(docs, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fallback8 = Dedup.simhashPairs(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(fallback8.filter(_._3 <= 7).toSet == banded7)
    assert(fallback8.exists(_._3 == 8) || fallback8.forall(_._3 <= 7))
  }

  test("quadratic cosine baseline refuses corpus-scale inputs") {
    val e = intercept[IllegalArgumentException](
      Similarity.nearDupPairs(emb, 0.4, maxRows = 3L))
    assert(e.getMessage.contains("lshCandidates"))
  }

  test("containment pairs: subset duplication scores ~1 even when jaccard is low") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon" // 3 shingles, all inside long
    val long = short + " zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val d = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // c(1->2) = 1.0 (every shingle of the short doc is in the long one);
    // c(2->1) = 3/15 < 0.9 so only the directional pair survives.
    assert(pairs == Set((1L, 2L, 1.0)))
    // Jaccard at the same threshold misses it entirely.
    assert(Dedup.ngramJaccardPairs(d, 3, 0.9).count() == 0L)
  }

  test("bm25 matches an independent reference computation, both idf modes") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a c"), (2L, "b c d"), (3L, "a a a"), (4L, "d e f g"))
    val d = corpus.toDF("doc_id", "text")
    val terms = Seq("a", "d")
    val (k1, b) = (1.2, 0.75)
    // Independent reference: plain Scala over the token lists.
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def expected(rational: Boolean): Map[Long, Double] =
      toks.flatMap { case (id, ws) =>
        val score = terms.map { t =>
          val df = toks.values.count(_.contains(t)).toDouble
          val arg = (n - df + 0.5) / (df + 0.5)
          val idf = if (rational) arg else math.log(arg)
          val tf = ws.count(_ == t).toDouble
          idf * tf * (k1 + 1.0) /
            (tf + k1 * ((1.0 - b) + b * ws.size.toDouble / avgdl))
        }.sum
        if (score > 0) Some(id -> score) else None
      }
    for (rational <- Seq(true, false)) {
      val got = TextOps.bm25(d, terms, k1, b, rationalIdf = rational)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = expected(rational)
      assert(got.keySet == want.keySet, s"rational=$rational")
      got.foreach { case (id, s) =>
        assert(math.abs(s - want(id)) < 1e-12, s"doc $id rational=$rational: $s vs ${want(id)}")
      }
    }
    // Spot-check one hand-derived value (rational idf): doc 3 = "a a a",
    // df(a)=2 -> idf=(4-2+0.5)/(2+0.5)=1.0, tf=3, dl=3, avgdl=3.5:
    // 1.0*3*2.2 / (3 + 1.2*(0.25 + 0.75*3/3.5)) = 6.6 / (3 + 1.071428...)
    val doc3 = TextOps.bm25(d, terms).filter(col("doc_id") === 3L)
      .head.getDouble(1)
    assert(math.abs(doc3 - 6.6 / (3.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.5))) < 1e-12)
  }

  test("semantic decontamination flags the planted duplicate at cosine 1.0") {
    import spark.implicits._
    // Corpus vector 10 IS benchmark vector 1 (same embedding, other id):
    // the broadcast threshold join must flag it at cosine exactly 1.0.
    val v1 = Seq.tabulate(8)(i => 0.5f + i)
    val v2 = Seq.tabulate(8)(i => (i * i).toFloat - 3f)
    val corpus = Seq((10L, v1), (11L, v2)).toDF("vec_id", "embedding")
    val bench = Seq((1L, v1)).toDF("vec_id", "embedding")
    val hits = Decontamination.embeddingOverlap(corpus, bench, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.length == 1)
    assert(hits(0)._1 == 1L && hits(0)._2 == 10L)
    // sqrt(dot)^2 rounding keeps the self-cosine within one ulp of 1.
    assert(math.abs(hits(0)._3 - 1.0) < 1e-12)
  }

  test("ngram novelty: duplicated docs score 0, unique docs score 1") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact dup of 1: zero unique grams
      (3L, "epsilon zeta eta theta"), // fully original
      (4L, "solo")) // < 2 words: no grams, absent from output
      .toDF("doc_id", "text")
    val out = CorpusSignals.ngramNovelty(d, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((3L, 3L, 1.0)))
  }

  test("bpe pair counts: hand-checked counts, rank order, short words excluded") {
    import spark.implicits._
    val d = Seq((1L, "abab ab x"), (2L, "abc")).toDF("doc_id", "text")
    // Pairs: abab -> ab, ba, ab; ab -> ab; abc -> ab, bc; "x" too short.
    val out = TextOps.bpePairCounts(d, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("ab", 4L, 1), ("ba", 1L, 2), ("bc", 1L, 3)))
  }

  test("oov rate: tokens outside the truncated vocabulary are counted per doc") {
    import spark.implicits._
    // tf: aa x4, bb x2, cc x1, dd x1 -> vocabSize=2 keeps {aa, bb}.
    val d = Seq((1L, "aa bb aa"), (2L, "aa cc dd aa bb")).toDF("doc_id", "text")
    val out = CorpusSignals.oovRate(d, 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((5L, 2L, 0.4)))
  }

  test("strata rebalancing keeps the smallest stratum whole and shrinks large ones") {
    // lang is the skewed stratum in the testdata (en dominates).
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.values.max > before.values.min, "testdata lost its lang skew")
    val after = Sampling.rebalanceStrata(docs, col("lang"), col("doc_id"))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = before.values.min.toDouble
    // The smallest stratum's threshold is sqrt(1) = keep-all: exact.
    val smallest = before.minBy(_._2)._1
    assert(after(smallest) == before(smallest))
    before.foreach { case (s, nB) =>
      val nA = after.getOrElse(s, 0L).toDouble
      val want = math.sqrt(minN / nB) * nB
      // Bernoulli membership: allow generous slack around the expectation.
      assert(math.abs(nA - want) <= math.max(8.0, 4.0 * math.sqrt(want)),
        s"stratum $s: kept $nA, expected ~$want of $nB")
    }
    // Determinism: the kept set is a pure function of (key, counts).
    val a = Sampling.rebalanceStrata(docs, col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.rebalanceStrata(docs, col("lang"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("edit-distance pairs: order-aware — a reshuffled word bag fails, a typo passes") {
    import spark.implicits._
    // Identical token SET (jaccard 1.0 on 1-grams) but reversed order: the
    // edit distance is large. A one-word typo of the same doc: small.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val reversed = (1 to 30).map(i => s"w$i").reverse.mkString(" ")
    val typo = base.replace("w7 ", "w7x ")
    val tiny = Seq((0L, base), (1L, reversed), (2L, typo)).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(tiny, maxDist = 10, prefixLen = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 2L)), "typo pair should verify")
    assert(!got.contains((0L, 1L)), "reversed doc must fail order-aware verification")
    // Verified distances are exact levenshtein values on the full corpus.
    val all = Dedup.editDistancePairs(docs, maxDist = 40, prefixLen = 200).collect()
    assert(all.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 40))
    assert(all.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("hash classifier: map-only plan, integer weight sum, score = mean weight") {
    val out = TextOps.hashClassifierScore(docs, 1024)
    // Hand-check one doc against a row-local recomputation.
    val row = out.orderBy("doc_id").head()
    val text = docs.orderBy("doc_id").head().getAs[String]("text")
    val toks = text.toLowerCase.split(" ", -1)
    val wsum = toks.map { w =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 1024) % 13 - 6
    }.sum
    assert(row.getAs[Long]("wsum") == wsum)
    assert(row.getAs[Long]("n_tokens") == toks.length.toLong)
    assert(row.getAs[Double]("score") == wsum.toDouble / toks.length)
    // No shuffle: the plan must contain no Exchange.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier should be map-only:\n$plan")
  }

  test("shuffle shards: a permutation with exact fixed-size shards, stable across runs") {
    val out = Sampling.shuffleShards(docs, 64, col("doc_id")).cache()
    val n = docs.count()
    assert(out.count() == n)
    // Ranks are exactly 1..n (a permutation).
    assert(out.agg(min("rn"), max("rn"), countDistinct("rn")).head() ==
      org.apache.spark.sql.Row(1L, n, n))
    // Every shard except the last has exactly 64 rows; shard ids are dense.
    val sizes = out.groupBy("shard_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keys.toSet == (0L until (n + 63) / 64).toSet)
    sizes.foreach { case (sid, cnt) =>
      if (sid < (n - 1) / 64) assert(cnt == 64L, s"shard $sid has $cnt rows")
    }
    // Deterministic: same assignment on a re-run.
    val again = Sampling.shuffleShards(docs, 64, col("doc_id"))
      .select("doc_id", "shard_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = out.select("doc_id", "shard_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == again)
    out.unpersist()
  }

  test("cooccurrence lift: hand-planted collocation dominates and lift is exact") {
    import spark.implicits._
    // "aa bb" occurs in every doc; fillers vary. aa only ever precedes bb.
    val tiny = (1 to 20).map(i => (i.toLong, s"aa bb f$i g${i % 3}")).toDF("doc_id", "text")
    val out = CorpusSignals.cooccurrenceLift(tiny, 5).collect()
    val topRow = out.find(_.getAs[Int]("rk") == 1).get
    assert(topRow.getAs[String]("w1") == "aa" && topRow.getAs[String]("w2") == "bb")
    // n_ab = 20, N = 60 pairs (3 per doc), n_a(aa left) = 20, n_b(bb right) = 20.
    assert(topRow.getAs[Long]("n_ab") == 20L)
    assert(topRow.getAs[Double]("lift") == (20.0 * 60.0) / (20.0 * 20.0))
  }

  test("tfidf cosine: exact duplicate scores 1.0; verification is row-local exact") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tiny = Seq(
      (0L, base), (1L, base),                       // exact duplicate pair
      (2L, "alpha beta gamma unrelated words here now then always maybe")
    ).toDF("doc_id", "text")
    val got = Similarity.tfidfCosinePairs(tiny, 0.0, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // Identical docs: num == n2, so cos = n2 / (sqrt(n2) * sqrt(n2)) —
    // bit-equal to the same fixed-order replay (1.0 up to the sqrt
    // round-trip, exactly reproducible by any IEEE engine).
    val n2dup = 10L // 10 terms, tf=1, idf weight = n_docs div df = 3 div {2,3} = 1
    assert(got((0L, 1L)) ==
      n2dup.toDouble / (math.sqrt(n2dup.toDouble) * math.sqrt(n2dup.toDouble)),
      s"identical docs must replay the exact formula, got $got")
    assert(math.abs(got((0L, 1L)) - 1.0) < 1e-12)
    assert(got.forall { case ((i, j), c) => i < j && c >= -1e-9 && c <= 1.0 + 1e-9 })
    // Corpus run: every emitted pair is an LSH candidate and above threshold.
    val out = Similarity.tfidfCosinePairs(docs, 0.9).collect()
    val cands = Dedup.minhashLshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall(r => cands.contains((r.getLong(0), r.getLong(1)))))
    assert(out.forall(_.getDouble(2) >= 0.9))
  }

  test("top terms per group: hand-planted counts and ranks") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "x x x y z", "en"), (1L, "x y y q r", "en"),
      (2L, "a a b c d", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = CorpusSignals.topTermsPerGroup(tiny, col("lang"), 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.toSet == Set(
      ("en", "x", 4L, 1), ("en", "y", 3L, 2),
      ("fr", "a", 2L, 1), ("fr", "b", 1L, 2)))
  }

  test("bpe merges match an independent single-node BPE implementation") {
    // Reference BPE on the collected corpus: word-frequency dict, greedy
    // (count desc, pair asc) merge, left-to-right non-overlapping apply.
    val words = docs.collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split(" ", -1))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var seg: Map[Seq[String], Long] =
      words.groupBy { case (w, _) => w.map(_.toString) }
        .map { case (p, m) => p -> m.values.sum }
    val expect = (1 to 3).map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (pieces, f) =>
        pieces.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((p1, p2), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      seg = seg.groupBy { case (pieces, _) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        pieces.foreach { x =>
          if (out.nonEmpty && out.last == p1 && x == p2) out(out.length - 1) = p1 + p2
          else out += x
        }
        out.toSeq
      }.map { case (p, m) => p -> m.values.sum }
      (step, p1, p2, cnt)
    }
    val got = TextOps.bpeMerges(docs, 3).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect, s"got ${got.toSeq}, want $expect")
  }

  test("bpe encode matches an independent single-node tokenizer apply") {
    // Reference apply: train 3 merges (same algorithm the merges test
    // validated), then tokenize EVERY non-empty word of every doc —
    // including the length-1 words training excludes — by the same
    // left-to-right non-overlapping scan, in merge order.
    val merges = TextOps.bpeMerges(docs, 3).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2)))
    def encode(w: String): Int = {
      var pieces: Seq[String] = w.map(_.toString)
      merges.foreach { case (p1, p2) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        pieces.foreach { x =>
          if (out.nonEmpty && out.last == p1 && x == p2) out(out.length - 1) = p1 + p2
          else out += x
        }
        pieces = out.toSeq
      }
      pieces.length
    }
    val collected = docs.collect()
    val expect = collected.map { r =>
      val toks = r.getAs[String]("text").toLowerCase.split(" ", -1).filter(_.nonEmpty)
      (r.getAs[Long]("doc_id"), toks.length.toLong, toks.map(encode(_).toLong).sum)
    }.sortBy(_._1)
    val got = TextOps.bpeEncode(docs, 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
    // Merging must actually compress: fewer tokens than word characters,
    // never fewer than one token per word.
    got.foreach { case (_, nWords, nTokens) => assert(nTokens >= nWords) }
    val totalWordChars = collected
      .map(_.getAs[String]("text").toLowerCase.count(_ != ' ').toLong).sum
    assert(got.map(_._3).sum < totalWordChars)
  }

  test("encodeWithMerges: frozen merge table reproduces the composed encode") {
    // Production shape: train ONCE, freeze the table, apply to any batch.
    // With the table bpeMerges trained, the apply-only path must be
    // byte-identical to the self-contained bpeEncode composition.
    val frozen = TextOps.bpeMerges(docs, 3).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val applied = TextOps.encodeWithMerges(docs, frozen).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val composed = TextOps.bpeEncode(docs, 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(applied.toSeq == composed.toSeq)
    // An empty table is the identity tokenizer: one token per character.
    val none = TextOps.encodeWithMerges(docs, Seq.empty).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    docs.collect().foreach { r =>
      val chars = r.getAs[String]("text").toLowerCase.count(_ != ' ').toLong
      assert(none(r.getAs[Long]("doc_id")) == chars)
    }
    // The frozen table applies to a batch it was NOT trained on.
    import spark.implicits._
    val fresh = Seq((100L, "unseen batch wording")).toDF("doc_id", "text")
    val out = TextOps.encodeWithMerges(fresh, frozen).collect()
    assert(out.length == 1 && out(0).getLong(2) >= 3L)
  }

  test("encodeWithMerges: doc-level replaces never span a word boundary") {
    import spark.implicits._
    // The encode applies merges over ONE framed string per doc; the
    // joining space must break frame adjacency, or the b|a contact
    // ACROSS "ab ab"'s boundary would merge and undercount.
    val d = Seq((1L, "ab ab"), (2L, "aaaa"), (3L, "ba")).toDF("doc_id", "text")
    val ba = TextOps.encodeWithMerges(d, Seq(("b", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ba(1L) == ((2L, 4L))) // no intra-word (b,a); boundary must not merge
    assert(ba(3L) == ((1L, 1L))) // intra-word b|a merges to one token
    // Left-to-right non-overlapping on adjacent repeats: aaaa + (a,a)
    // -> aa|aa (a just-merged token never re-merges).
    val aa = TextOps.encodeWithMerges(d, Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(aa(2L) == 2L)
    assert(aa(1L) == 4L)
  }

  test("corpus report: exact counts, dup detection, deterministic top language") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta", "en", "web"),
      (2L, "alpha beta", "en", "web"), // exact dup of 1 within web
      (3L, "gamma delta epsilon", "fr", "web"),
      (4L, "zeta", "fr", "books"),
      (5L, "eta theta", "en", "books") // en/fr tie in books -> 'en' (lexicographic)
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.ops.Report.corpusReport(d).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("books", 2L, 2L, 3L, 13L, "en"),
      ("web", 3L, 2L, 7L, 39L, "en")))
  }

  test("semdedup: drops within-cluster near-parallel vectors, keeps across clusters") {
    import spark.implicits._
    // cells=2 -> centroids are vectors 0 and 1 (the axes).
    val emb = Seq(
      (0L, Seq(1f, 0f)),      // centroid/cell 0
      (1L, Seq(0f, 1f)),      // centroid/cell 1
      (2L, Seq(3f, 0.3f)),    // cell 0, cos(v0,v2)=0.995 -> dropped
      (3L, Seq(1f, 1f)),      // tie -> cell 0; cos vs v0/v2 < 0.95 -> kept
      (4L, Seq(0f, 5f))       // cell 1, cos(v1,v4)=1 -> dropped
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.semDedupKeep(emb, cells = 2, threshold = 0.95)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 0L), (1L, 1L), (3L, 0L)))
  }

  test("surprisal: rare tokens cost bits, universal tokens cost none, all-integer") {
    import spark.implicits._
    // 4 docs; "the" appears in all (df=4, ratio 1, 0 bits), "cat" in one
    // (df=1, ratio 4, 2 bits), "dog" in two (df=2, ratio 2, 1 bit).
    val d = Seq(
      (1L, "the cat cat"), (2L, "the dog"), (3L, "the dog"), (4L, "the")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.surprisalScore(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 3L, 4L),  // the:0 + 2*cat:2
      (2L, 2L, 1L), (3L, 2L, 1L), (4L, 1L, 0L)))
  }

  test("gopher flags: each rule trips on its own violation, keep is the AND") {
    import spark.implicits._
    val good = (Seq("the", "a") ++ (1 to 30).map(i => s"word$i")).mkString(" ")
    val d = Seq(
      (1L, good),                                  // passes all four
      (2L, "the a tiny"),                          // too short
      (3L, good.replace("word1", "w") + " " + (1 to 40).map(_ => "ab").mkString(" ")), // repetition: 'ab' dominates
      (4L, (1 to 30).map(i => s"word$i").mkString(" ")), // no stop words
      (5L, good + " {end.")                        // char flags fire, still kept
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.gopherC4Flags(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(r.fieldIndex("keep")),
        r.getBoolean(r.fieldIndex("ends_punct")), r.getBoolean(r.fieldIndex("has_brace"))))
    assert(out.toSeq == Seq(
      (1L, true, false, false), (2L, false, false, false),
      (3L, false, false, false), (4L, false, false, false),
      (5L, true, true, true)))
  }

  test("event spikes: flags the 2-sigma day, integer math matches hand calc") {
    import spark.implicits._
    // type 'a': counts 10,10,10,10,40 over 5 days -> mean 16, var 144,
    // std 12; |40-16|=24 >= 2*12 -> day 5 is a spike, the 10s are not
    // (|10-16|=6 < 24). Type 'b': flat -> var 0, every day |c-mean|=0
    // >= 0 -> all flagged (degenerate, documents the >= semantics).
    def day(d: Int, n: Int, tpe: String) = (1 to n).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$d%d 12:00:00"), tpe))
    // Type 'c' distinguishes (n·c − S)² from a dropped-subtraction (n·c)²:
    // counts 100,101 give |n·c − S| = 1, lhs 1 < rhs 4 -> NOT a spike,
    // while the unsubtracted square (200²) would flag it.
    val ev = ((1 to 4).flatMap(d => day(d, 10, "a")) ++ day(5, 40, "a") ++
      (1 to 3).flatMap(d => day(d, 7, "b")) ++
      day(1, 100, "c") ++ day(2, 101, "c"))
      .toDF("ts", "event_type")
    val out = graft.ops.Funnels.eventSpikes(ev)
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
        r.getBoolean(3)))
    assert(out.count(_._1 == "a") == 5)
    assert(out.filter(_._1 == "a").map(_._4).toSeq ==
      Seq(false, false, false, false, true))
    assert(out.filter(_._1 == "b").forall(_._4))
    assert(out.filter(_._1 == "c").map(_._4).toSeq == Seq(false, false))
  }

  test("bigram lm: counts adjacent pairs, argmax continuation, tie to largest") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a c"),  // a->b x2, b->a x2, a->c x1
      (2L, "a c"),          // a->c x1  => a: b=2, c=2 tie -> 'c' (largest)
      (3L, "z")             // single token: no pairs
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.bigramLm(d, topContexts = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 4L, "c", 2L), ("b", 2L, "a", 2L)))
  }

  test("bigram surprisal: per-doc bits match hand-computed bit lengths") {
    import spark.implicits._
    // Corpus pair counts: (a,b)=2, (b,a)=2, (a,c)=2; contexts a=4, b=2.
    // doc 1: (a,b)x2 -> floor(log2(4/2))=1 each = 2; (b,a)x2 -> 2/2 -> 0;
    //        (a,c)x1 -> 4/2 -> 1.  total 3 bits over 5 pairs.
    // doc 2: (a,c)x1 -> 1 bit over 1 pair.  doc 3: no pairs -> absent.
    val d = Seq((1L, "a b a b a c"), (2L, "a c"), (3L, "z"))
      .toDF("doc_id", "text")
    // Select by NAME: the op's column order is not part of its contract
    // (r16 emits bigram_bits first for the exchange-reuse canonical form).
    val out = graft.ops.TextOps.bigramSurprisal(d)
      .select("doc_id", "n_pairs", "bigram_bits")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 5L, 3L), (2L, 1L, 1L)))
  }

  test("vocab coverage: exclusive-prefix admission at the exact boundary") {
    import spark.implicits._
    // Counts a=4, b=3, d=2, c=1 (total 10); rank cums 4, 7, 9, 10.
    val d = Seq((1L, "a a a a"), (2L, "b b b c"), (3L, "d d"))
      .toDF("doc_id", "text")
    def run(num: Int) = graft.ops.CorpusSignals.vocabCoverage(d, num, 100)
      .orderBy(col("cnt").desc, col("word")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 80%: admission stops once coverage-before reaches 8/10 — the term
    // crossing the line (d, cum_before 7) is in, the next (c, 9) is out.
    assert(run(80).toSeq == Seq(("a", 4L, 4L), ("b", 3L, 7L), ("d", 2L, 9L)))
    // 70%: d's cum_before is exactly the target (7*100 == 70*10) -> out;
    // the strict < is what "smallest covering vocabulary" means.
    assert(run(70).toSeq == Seq(("a", 4L, 4L), ("b", 3L, 7L)))
    // 100%: everything admitted.
    assert(run(100).length == 4)
  }

  test("profile: one row per column with exact null and distinct counts") {
    import spark.implicits._
    val d = Seq((1L, Some("x")), (2L, Some("y")), (3L, None), (4L, Some("x")))
      .toDF("id", "tag")
    val out = graft.ops.Report.profile(d, Seq("id", "tag"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("id", 4L, 0L, 4L), ("tag", 4L, 1L, 2L)))
    // Empty input still reports one all-zero row per column, matching
    // what a per-column COUNT(*) emits on an empty table.
    val empty = graft.ops.Report.profile(d.limit(0), Seq("id", "tag"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(empty.toSeq == Seq(("id", 0L, 0L, 0L), ("tag", 0L, 0L, 0L)))
  }

  test("profile: float columns and unknown columns fail loudly") {
    import spark.implicits._
    val d = Seq((1L, 0.5, Seq(0.5f), "x")).toDF("id", "dbl", "farr", "tag")
    // Top-level double, float nested in an array, and a misspelled name
    // must all fail at the edge — not return engine-specific numbers.
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Report.profile(d, Seq("id", "dbl"))
    }
    assert(e1.getMessage.contains("float") && e1.getMessage.contains("dbl"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Report.profile(d, Seq("farr"))
    }
    assert(e2.getMessage.contains("farr"))
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Report.profile(d, Seq("id", "nope"))
    }
    assert(e3.getMessage.contains("nope") && e3.getMessage.contains("tag"))
    // The allowed types still work untouched.
    assert(graft.ops.Report.profile(d, Seq("id", "tag")).count() == 2)
  }

  test("incremental dedup: keeps novel incoming docs, drops dups of existing and earlier-incoming") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val existing = Seq(
      (1L, base),
      (2L, "completely different corpus content about databases and engines at scale")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base), // dup of existing doc 1 -> dropped
      (11L, "a genuinely novel incoming document with fresh words nobody wrote before"),
      (12L, "twin incoming payload sentence repeated across the batch exactly verbatim"),
      (13L, "twin incoming payload sentence repeated across the batch exactly verbatim")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalKeep(existing, incoming)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 4)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._2 >= 1 && !byId(10L)._4, s"dup-of-existing: ${byId(10L)}")
    assert(byId(11L) == ((11L, 0L, 0L, true)), s"novel: ${byId(11L)}")
    // Twin pair: the SMALLER id keeps (no earlier match), the larger drops
    // with a prior-duplicate count.
    assert(byId(12L)._3 == 0L && byId(12L)._4, s"first twin keeps: ${byId(12L)}")
    assert(byId(13L)._3 >= 1 && !byId(13L)._4, s"second twin drops: ${byId(13L)}")
  }

  test("linear probe gradient step matches an exact BigDecimal reimplementation") {
    val w0 = Seq("0.010000", "0.020000", "-0.010000", "0.000100").map(BigDecimal(_))
    val lr = BigDecimal("0.000000001")
    val stopsEn = Set("the", "a", "of", "and", "to")
    val stopsFr = Set("le", "la", "les", "de", "et")
    var g = Array.fill(4)(BigDecimal(0))
    docs.collect().foreach { r =>
      val toks = r.getAs[String]("text").toLowerCase.split(" ", -1)
      val y = if (r.getAs[String]("lang") == "en") 1 else 0
      val x = Array(BigDecimal(1),
        BigDecimal(toks.count(stopsEn)), BigDecimal(toks.count(stopsFr)),
        BigDecimal(toks.length))
      val res = w0.zip(x).map { case (wi, xi) => wi * xi }.sum - y
      (0 to 3).foreach(k => g(k) += res * x(k))
    }
    val expect = (0 to 3).map(k =>
      (k, w0(k).toDouble, g(k).toDouble, (w0(k) - lr * g(k)).toDouble))
    val got = graft.ops.Probe.linearProbeStep(docs).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expect, s"got ${got.toSeq}\nwant $expect")
  }

  test("winnowing: shared >= w+k-1 substring guarantees a shared fingerprint") {
    import spark.implicits._
    val shared = "zqxwvutsrqponml" // 15 chars >= w + k - 1 = 11
    val tiny = Seq(
      (0L, s"aaaa bbbb $shared cccc dddd"),
      (1L, s"完全 different prefix $shared and suffix here"),
      (2L, "nothing in common with the others at all ok")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(tiny, 8, 4).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert(fps(0L).intersect(fps(1L)).nonEmpty,
      "docs sharing an 11+-char substring must share a winnowed fingerprint")
    // Fingerprints are a subset of the doc's own k-gram hashes (window
    // minima), checked against the SUM-form polynomial — the oracle's
    // formulation, independent of the expression's fold-with-mod.
    val doc0 = tiny.filter(col("doc_id") === 0L).head().getString(1)
    val all0 = (1 to math.max(doc0.length - 7, 1)).map { i =>
      val kg = doc0.substring(i - 1, math.min(i + 7, doc0.length))
      val cps = kg.codePoints().toArray
      cps.zipWithIndex.map { case (cp, j) =>
        BigInt(cp) * BigInt(31).pow(cps.length - 1 - j)
      }.sum.mod(BigInt(1000000007L)).toLong
    }.toSet
    assert(fps(0L).subsetOf(all0))
    // Degenerate inputs survive: shorter than k, and empty text.
    val short = Seq((10L, "tiny"), (11L, "")).toDF("doc_id", "text")
    val shortFps = TextOps.winnowFingerprints(short, 8, 4).collect()
    assert(shortFps.count(_.getLong(0) == 10L) == 1) // one k-gram, one window
    assert(shortFps.count(_.getLong(0) == 11L) == 1)
  }

  test("exact-substring pairs: a planted >= w+k-1 run surfaces; boilerplate df cap drops common grams") {
    import spark.implicits._
    // 30-char shared run >= w + k - 1 = 27 for (k=20, w=8): the winnowing
    // guarantee says docs 0 and 1 select a common anchor hash inside it.
    val run = "zq1xw2vu3ts4rq5po6nm7lk8ji9hg0"
    val boiler = "every document carries this exact same boilerplate sentence"
    val tiny = Seq(
      (0L, s"alpha beta $run gamma delta $boiler"),
      (1L, s"completely other prefix $run trailing words $boiler"),
      (2L, s"unrelated content entirely its own here $boiler"),
      (3L, s"quartz umber kestrel vivid nothing overlapping $boiler"),
      (4L, s"maple ginger osprey violet wholly disjoint words $boiler")
    ).toDF("doc_id", "text")
    // maxDf = 3 < 5 docs: anchors from the shared boilerplate (df 5) are
    // dropped; the planted run (df 2) survives and verifies.
    val pairs = Dedup.exactSubstringPairs(tiny, 20, 8, maxDf = 3, minAnchors = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "planted 30-char shared run must surface")
    assert(!pairs.exists { case (a, b) => Set(a, b).subsetOf(Set(2L, 3L, 4L)) },
      "docs sharing ONLY the over-common boilerplate must not pair (df cap)")
    // Anchor selection is the oracle's rule exactly: leftmost window
    // argmin over per-position sum-form polynomial hashes — recompute
    // doc 0's anchors independently and compare packed values.
    val doc0 = tiny.filter(col("doc_id") === 0L).head().getString(1)
    val (k, w) = (20, 8)
    val hs = (1 to math.max(doc0.length - k + 1, 1)).map { i =>
      val kg = doc0.substring(i - 1, math.min(i + k - 1, doc0.length))
      val cps = kg.codePoints().toArray
      cps.zipWithIndex.map { case (cp, j) =>
        BigInt(cp) * BigInt(31).pow(cps.length - 1 - j)
      }.sum.mod(BigInt(1000000007L)).toLong
    }.toIndexedSeq
    val expected = (1 to math.max(hs.length - (w - 1), 1)).map { i =>
      val win = hs.slice(i - 1, math.min(i - 1 + w, hs.length))
      val mn = win.min
      (mn << 32) | (i + win.indexOf(mn)).toLong
    }.toSet
    graft.functions.GraftFunctions.register(spark)
    val got = tiny.filter(col("doc_id") === 0L)
      .select(explode(expr(s"winnow_anchors(text, $k, $w)")).as("p"))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, "winnow_anchors must match the sum-form leftmost-argmin selection")
  }

  test("substring spans: planted shared run measures exactly; cap bounds identical twins") {
    import spark.implicits._
    // 35-char run (>= 27 surfaces it) embedded with DIFFERENT chars at
    // both junctions, so the extension must stop exactly at the run.
    val run = "zq1xw2vu3ts4rq5po6nm7lk8ji9hg0fedcb"
    val tiny = Seq(
      (0L, s"aaaa X${run}Y bbbb"),
      (1L, s"cccc dddd P${run}Q eeee"),
      (2L, "wholly unrelated filler text here"),
      (3L, "a1b2c3 shared tail sentence for the twins d4e5f6 g7h8i9 j0k1l2 m3n4o5 p6q7r8"),
      (4L, "a1b2c3 shared tail sentence for the twins d4e5f6 g7h8i9 j0k1l2 m3n4o5 p6q7r8")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(tiny, 20, 8, maxDf = 10, cap = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(spans((0L, 1L)) == run.length.toLong,
      s"planted ${run.length}-char run must measure exactly, got ${spans.get((0L, 1L))}")
    // Identical twins: the span is the full text length but never
    // exceeds k + 2*cap; with cap 60 the text length itself binds here.
    val twinLen = tiny.filter(col("doc_id") === 3L).head().getString(1).length.toLong
    assert(spans((3L, 4L)) == twinLen)
    val capped = Dedup.exactSubstringSpans(tiny, 20, 8, maxDf = 10, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped((3L, 4L)) <= 20L + 2L * 10L)
    // CommonExtent itself, hand-checked: anchor "bcdefghij" (k=9) at
    // pos 2 in both; left extends 1 ('a'='a'), right stops at 'X' vs 'Y'.
    graft.functions.GraftFunctions.register(spark)
    val one = Seq(("abcdefghijkXm", 2L, "abcdefghijkYz", 2L)).toDF("ta", "pa", "tb", "pb")
    val got = one.select(expr("common_extent(ta, pa, tb, pb, 9, 60)")).head().getLong(0)
    assert(got == 9L + 1L + 1L, s"expected 11, got $got") // k + left 'a' + right 'k'
  }

  test("span excision cuts the longest shared run from the later doc only") {
    import spark.implicits._
    val run = "zq1xw2vu3ts4rq5po6nm7lk8ji9hg0fedcb" // 35 chars
    val tiny = Seq(
      (0L, s"aaaa X${run}Y bbbb"),
      (1L, s"cccc dddd P${run}Q eeee"),
      (2L, "wholly unrelated filler text here"),
      (3L, "a1b2c3 shared tail sentence for the twins d4e5f6 g7h8i9 j0k1l2 m3n4o5 p6q7r8"),
      (4L, "a1b2c3 shared tail sentence for the twins d4e5f6 g7h8i9 j0k1l2 m3n4o5 p6q7r8")
    ).toDF("doc_id", "text")
    val out = Dedup.excisedSpans(tiny, 20, 8, maxDf = 10, cap = 60, minSpan = 30)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getString(6)))).toMap
    // Only the LATER side of each pair is rewritten; untouched docs absent.
    assert(out.keySet == Set(1L, 4L))
    val (src, start, span, cleanLen, cleanMd5) = out(1L)
    assert(src == 0L && span == 35L)
    assert(start == "cccc dddd P".length + 1) // 1-based start of the run
    val expectClean = "cccc dddd PQ eeee"
    assert(cleanLen == expectClean.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(cleanMd5 == md)
    // Identical twins: the whole text is the shared run — excision empties it.
    val (src4, start4, span4, cleanLen4, _) = out(4L)
    assert(src4 == 3L && start4 == 1L && cleanLen4 == 0L)
    assert(span4 == tiny.filter(col("doc_id") === 3L).head().getString(1).length.toLong)
  }

  test("dsir weights replay an independent hashed-bigram bit-length computation") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund lief im park heute", "de"),
      (3L, "the cat lief im park", "de"),
      (4L, "x", "en") // single token: no bigrams, absent from output
    ).toDF("doc_id", "text", "lang")
    val rows = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund lief im park heute", "de"),
      (3L, "the cat lief im park", "de"))
    def bigrams(t: String): Seq[String] = {
      val w = t.toLowerCase.split(" ", -1)
      (0 until w.length - 1).map(i => w(i) + " " + w(i + 1))
    }
    def bucket(bg: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16) % 4096
    }
    def bits(x: Long): Long = if (x <= 0) 0L else 64L - java.lang.Long.numberOfLeadingZeros(x)
    val all = rows.flatMap { case (id, t, lang) => bigrams(t).map(b => (id, lang, bucket(b))) }
    val nRaw = all.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val nTgt = all.filter(_._2 == "en").groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val expected = all.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.size.toLong,
        xs.map(x => bits(nTgt.getOrElse(x._3, 0L)) - bits(nRaw(x._3))).sum))
    }
    val got = TextOps.dsirWeights(tiny, "en", 4096).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got, expected $expected")
    // Direction sanity: the pure-target doc scores 0 or better; the
    // all-foreign-bigram doc scores strictly negative.
    assert(got(0L)._2 >= 0L)
    assert(got(2L)._2 < 0L)
  }

  test("kmeans training: zero iterations reproduces the seed assignment; trained assignment stays total") {
    val seedAsg = Similarity.ivfAssign(emb, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val zero = Similarity.kmeansTrain(emb, 16, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero == seedAsg, "iters=0 must equal the ivfAssign seed assignment")
    val trained = Similarity.kmeansTrain(emb, 16, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(trained.keySet == zero.keySet, "every vector stays assigned")
    assert(trained.values.forall(c => c >= 0 && c < 16))
    assert(trained != zero, "two Lloyd iterations should move at least one assignment")
  }

  test("luhn scan validates real checksums and masks only passing runs") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "pay 4539578763621486 now"),        // valid Luhn (16 digits)
      (2L, "pay 4539578763621487 now"),        // one digit off: invalid
      (3L, "ref 79927398713 only"),            // 11 digits: not a candidate
      (4L, "a 4539578763621486 b 378282246310005 c"), // two valid (16 + 15)
      (5L, "no digits here")
    ).toDF("doc_id", "text")
    val out = TextOps.luhnScan(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "pay [PAN] now")))
    assert(out(2L) == ((1L, 0L, "pay 4539578763621487 now")))
    assert(out(3L) == ((0L, 0L, "ref 79927398713 only")))
    assert(out(4L) == ((2L, 2L, "a [PAN] b [PAN] c")))
    assert(out(5L) == ((0L, 0L, "no digits here")))
    // The synthesized fixture: even ids valid, odd invalid, %5 none.
    val synth = TextOps.luhnScan(TextOps.synthesizeCardText(docs)).collect()
    synth.foreach { r =>
      val id = r.getLong(0)
      val expect = if (id % 5 == 0) (0L, 0L) else (1L, if (id % 2 == 0) 1L else 0L)
      assert((r.getLong(1), r.getLong(2)) == expect, s"doc $id")
    }
  }

  test("shard manifest checksums replay independently and pin shard order") {
    val rows = graft.ops.Sampling.shardManifest(docs, 8, col("doc_id")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val total = docs.count()
    assert(rows.values.map(_._1).sum == total)
    // Full shards are exactly 8 docs; only the last may be ragged.
    assert(rows.filter(_._1 < rows.keys.max).values.forall(_._1 == 8L))
    // Independent recomputation of one shard's checksum from the corpus.
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (md5hex(r.getLong(0).toString), r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2))
    val shard0 = ordered.take(8).map(t => md5hex(t._3)).mkString
    assert(rows(0L)._3 == md5hex(shard0))
  }

  test("lsh tuning card counts are internally consistent") {
    // Construction registers two thread-local isolation persists (eager
    // by design — see the scaladoc); drain them here rather than leaning
    // on the fixture-level clearCache so the suite's cache state stays
    // clean between tests.
    try {
      val r = Dedup.lshTuningCard(docs, 3, 0.8, 8, 4).head()
      val (nc, nt, nv, nm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nv <= nc && nv <= nt, "verified is an intersection")
      assert(nv + nm == nt, "verified + missed partitions the true pairs")
      // On this corpus the exact duplicates share most shingles, so 4-band
      // minhash should find at least one of them.
      assert(nt > 0 && nv > 0)
    } finally graft.ops.CacheScope.releaseCurrent()
  }

  test("waterfill quotas: exact budget, caps only the dominant sources") {
    import spark.implicits._
    def mk(sizes: (String, Int)*) = sizes.flatMap { case (src, words) =>
      Seq((src, Seq.fill(words)("w").mkString(" ")))
    }.toDF("source", "text")
    // s = [10, 20, 100], B = 65 -> L* = 35, quotas [10, 20, 35].
    val out1 = graft.ops.Sampling.mixtureWaterfill(mk("a" -> 10, "b" -> 20, "c" -> 100), 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out1 == Map("a" -> 10L, "b" -> 20L, "c" -> 35L))
    // B = 40% of 130 = 52 -> a and b saturate (10 + 20), c capped at 22.
    val out2 = graft.ops.Sampling.mixtureWaterfill(mk("a" -> 10, "b" -> 20, "c" -> 100), 2, 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2("a") == 10L && out2.values.sum == 52L && out2("b") <= 20L)
    // Budget >= total: everyone keeps everything.
    val out3 = graft.ops.Sampling.mixtureWaterfill(mk("a" -> 10, "b" -> 20), 3, 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out3 == Map("a" -> 10L, "b" -> 20L))
    // Property sweep on the corpus: Σ quota == min(B, total), quota <= s.
    for ((num, den) <- Seq((1L, 10L), (1L, 2L), (9L, 10L), (2L, 1L))) {
      val rows = graft.ops.Sampling.mixtureWaterfill(docs, num, den).collect()
      val tot = rows.map(_.getLong(1)).sum
      val b = tot * num / den
      assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
      assert(rows.map(_.getLong(2)).sum == math.min(b, tot), s"budget $num/$den")
    }
  }

  test("grouped quantiles replay the rank rule on a hand-checked group") {
    import spark.implicits._
    // Group a: values 1..10 -> q50 = 5 (first cum >= 5), q95 = 10.
    // Group b: value 7 three times -> every quantile is 7.
    val tiny = ((1 to 10).map(v => ("a", v.toLong)) ++ Seq.fill(3)(("b", 7L)))
      .toDF("src", "len")
    val out = Quantiles.groupedRankQuantiles(tiny, col("src"), "src",
      col("len"), Seq(0.5, 0.95)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((10L, 5L, 10L)))
    assert(out("b") == ((3L, 7L, 7L)))
    // Against the sf corpus: group-local quantiles are monotone and lie
    // inside the group's min/max.
    val card = Quantiles.groupedRankQuantiles(docs, col("source"), "source",
      col("n_chars"), Seq(0.25, 0.5, 0.75, 0.95)).collect()
    card.foreach { r =>
      val qs = (2 to 5).map(r.getLong)
      assert(qs == qs.sorted, s"quantiles must be monotone: $r")
    }
  }

  test("perplexity buckets: exact thirds, monotone under the scaled-rate order") {
    val out = TextOps.perplexityBuckets(docs, 3, 20).collect()
    assert(out.nonEmpty)
    val sizes = out.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 1, s"NTILE sizes must differ by <= 1: $sizes")
    // Bucket assignment is monotone in the (ppl_scaled, doc_id) order.
    val sorted = out.sortBy(r => (r.getLong(2), r.getLong(0)))
    assert(sorted.map(_.getInt(3)).sliding(2).forall(p => p.head <= p.last))
    // The scaled rate replays its own definition for every row.
    val scored = TextOps.bigramSurprisal(docs)
      .select("doc_id", "n_pairs", "bigram_bits").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out.foreach { r =>
      val (nPairs, bits) = scored(r.getLong(0))
      assert(r.getLong(2) == (bits << 20) / nPairs)
      assert(r.getLong(1) == nPairs)
    }
  }

  test("source drift: planted over/under-representation flags exactly; absent token rides the grid") {
    import spark.implicits._
    // Corpus: srcA is all "cat" (20 tokens), srcB is all "dog" (20),
    // srcC is an even cat/dog mix (10+10). N_total = 60; corpus rate of
    // each word is 30/60 = 1/2.
    val tiny = Seq(
      (0L, Seq.fill(20)("cat").mkString(" "), "srcA"),
      (1L, Seq.fill(20)("dog").mkString(" "), "srcB"),
      (2L, (Seq.fill(10)("cat") ++ Seq.fill(10)("dog")).mkString(" "), "srcC")
    ).toDF("doc_id", "text", "source")
    val rows = CorpusSignals.sourceDrift(tiny, topK = 2, factor = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(rows.size == 6) // 3 sources x top-2 words, absent combos included
    // srcA/cat: 20/20 vs corpus 1/2 -> rate 1 > 2*(1/2)? 20*60 > 2*30*20 = false
    // (exactly 2x the corpus rate is NOT over by a strict >): pin strictness.
    assert(rows(("srcA", "cat")) == ((20L, false, false)))
    // srcA/dog: 0 occurrences -> under_rep (2*0*60 < 30*20), grid row exists.
    assert(rows(("srcA", "dog")) == ((0L, false, true)))
    assert(rows(("srcB", "cat")) == ((0L, false, true)))
    // srcC: at exactly the corpus rate -> neither flag.
    assert(rows(("srcC", "cat")) == ((10L, false, false)))
    assert(rows(("srcC", "dog")) == ((10L, false, false)))
  }

  test("tokenizer fertility: hand-computed per-language totals after one trained merge") {
    import spark.implicits._
    // Pair counts across the corpus: (a,b) appears 3x (abab twice + ab
    // once), (c,d) 2x — so the single trained merge is (a,b). Encoded:
    // "abab ab" -> [ab|ab, ab] = 3 tokens; "cd cd" -> [c|d, c|d] = 4.
    val tiny = Seq(
      (0L, "abab ab", "aa"),
      (1L, "cd cd", "bb")
    ).toDF("doc_id", "text", "lang")
    val rows = TextOps.tokenizerFertility(tiny, 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("aa") == ((1L, 2L, 3L, 6L))) // docs, words, tokens, non-space chars
    assert(rows("bb") == ((1L, 2L, 4L, 4L)))
  }

  test("funnel: order matters — a click before the first view does not convert") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"), // full
      (2L, ts(10), "click"), (2L, ts(20), "view"),                           // click BEFORE view
      (3L, ts(10), "view"), (3L, ts(20), "click"),                           // no purchase
      (4L, ts(5), "purchase")                                                // purchase only
    ).toDF("user_id", "ts", "event_type")
    val row = Funnels.funnelCounts(ev, Seq("view", "click", "purchase")).head()
    assert(row.getAs[Long]("n_view") == 3L)     // users 1, 2, 3
    assert(row.getAs[Long]("n_click") == 2L)    // users 1, 3 (user 2's click precedes the view)
    assert(row.getAs[Long]("n_purchase") == 1L) // user 1 only
  }

  test("cohort retention: users count in their signup-week cohort only") {
    import spark.implicits._
    val t = (d: String) => java.sql.Timestamp.valueOf(d)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), "signup"), // week of Jan 1 (Monday)
      (1L, t("2024-01-09 10:00:00"), "click"),  // active week of Jan 8
      (2L, t("2024-01-10 10:00:00"), "signup"), // week of Jan 8
      (2L, t("2024-01-02 10:00:00"), "click"),  // PRE-signup activity -> above-diagonal, excluded
      (3L, t("2024-01-03 10:00:00"), "click")   // never signed up -> excluded
    ).toDF("user_id", "ts", "event_type")
    val got = Funnels.cohortRetention(ev, "signup").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:00:00.0") -> 1L, // user 1 signup week
      ("2024-01-01 00:00:00.0", "2024-01-08 00:00:00.0") -> 1L, // user 1 retained week 2
      ("2024-01-08 00:00:00.0", "2024-01-08 00:00:00.0") -> 1L  // user 2 signup week
    ), got.toString)
  }

  test("bpe merges survive words collapsing to a single piece") {
    import spark.implicits._
    // "ab" fully merges in step 1; later steps must not explode pairs from
    // its single-piece segmentation (sequence(1, 0) would descend).
    val tiny = Seq((0L, "ab ab ab ab cd cd ce")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(tiny, 3).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got(0) == ((1, "a", "b", 4L)))
    // Step 2: remaining pairs are cd(2), ce(1) -> "c","d" wins.
    assert(got(1) == ((2, "c", "d", 2L)))
    // Step 3: only "c","e" remains.
    assert(got(2) == ((3, "c", "e", 1L)))
  }

  test("negative samples: k draws per anchor, deterministic, never self") {
    val out = Sampling.negativeSamples(docs, 3, col("doc_id")).cache()
    val n = docs.count()
    // Every anchor draws 3 slots minus the ~1/n self-draw filter.
    val total = out.count()
    assert(total <= 3 * n && total >= 3 * n - 10, s"got $total of ${3 * n}")
    assert(out.filter(col("neg_id") === col("anchor_id")).count() == 0)
    // Negatives are valid corpus ids, and the draw replays exactly.
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.select("neg_id").collect().forall(r => ids.contains(r.getLong(0))))
    val again = Sampling.negativeSamples(docs, 3, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    out.unpersist()
  }

  test("hard negatives: top-k similar with a DIFFERENT label, never same-label") {
    val queries = emb.filter(col("vec_id") < 8)
    val out = Similarity.hardNegatives(emb, queries, 5).collect()
    assert(out.length == 40) // 8 queries x 5
    val labels = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall(r => labels(r.getLong(1)) != labels(r.getLong(0))),
      "a hard negative must not share the query's label")
    // Each negative is at most as similar as the unrestricted top-1.
    val unrestricted = Similarity.bruteForceTopK(emb, queries, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    out.filter(_.getInt(2) == 1).foreach { r =>
      assert(r.getDouble(3) <= unrestricted(r.getLong(0)) + 1e-12)
    }
  }

  test("cluster best-keep: exactly one survivor per cluster, the top-quality one") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.8)
    val scores = TextOps.qualityScore(docs).select(col("doc_id"), col("quality"))
    val kept = DedupClusters.bestPerCluster(docs, pairs, scores).cache()
    val clusters = DedupClusters.connectedComponents(docs, pairs)
    // One keeper per cluster, covering every cluster.
    assert(kept.count() == clusters.select("cluster_id").distinct().count())
    // The keeper's quality is the cluster maximum.
    val qByDoc = scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = clusters.collect()
      .groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.map(_.getLong(0)) }
    kept.collect().foreach { r =>
      val (c, d) = (r.getLong(0), r.getLong(1))
      assert(qByDoc(d) == byCluster(c).map(qByDoc).max,
        s"cluster $c kept $d which is not its max-quality member")
    }
    kept.unpersist()
  }

  test("token budget mix: per-source cap respected with never-split documents") {
    val out = Sampling.tokenBudgetPerStratum(docs, col("source"), 700L, col("doc_id"))
      .collect()
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      val cums = rows.sortBy(_.getLong(3))
      // Admission rule: every admitted doc's exclusive prefix is under
      // budget, so all but the last stay under it even inclusively.
      val last = cums.last
      assert(last.getLong(3) - last.getLong(2) < 700L, s"$src overshot admission")
      cums.dropRight(1).foreach(r => assert(r.getLong(3) - r.getLong(2) < 700L))
      // Cumulative sums are consistent (no document was split).
      assert(cums.map(_.getLong(2)).sum == last.getLong(3),
        s"$src cum_tokens mismatch")
    }
  }

  test("self-repetition trim: repeated chunks drop, first occurrence and order survive") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "a b c a b c d e f a b c"), // chunks: abc, abc, def, abc -> abc def
      (1L, "x y z q r s")              // no repeats
    ).toDF("doc_id", "text")
    val out = TextOps.selfRepetitionTrim(tiny, 3).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_chunks") == 4L && out(0).getAs[Long]("n_kept") == 2L)
    val wantMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d e f".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("trimmed_md5") == wantMd5)
    assert(out(1).getAs[Long]("n_kept") == 2L) // both chunks unique
  }

  test("packing card: hand-checked windows, waste identity, lower bound") {
    import spark.implicits._
    // Token counts 3, 4, 5 at window 4 -> naive windows 1+1+2 = 4,
    // waste 16-12 = 4, perfect packing needs ceil(12/4) = 3.
    val tiny = Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val r = graft.ops.Sampling.packingCard(tiny, 4).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 12L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L && r.getLong(4) == 3L)
    // Corpus invariants: waste == naive*W - tokens; bound <= naive.
    val c = graft.ops.Sampling.packingCard(docs, 512).collect()(0)
    assert(c.getLong(3) == c.getLong(2) * 512 - c.getLong(1))
    assert(c.getLong(4) <= c.getLong(2))
  }

  test("blocklist screen counts per category and thresholds the keep bit") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "clean text entirely"),
      (2L, "bad bad ugly fine"),
      (3L, "bad text")).toDF("doc_id", "text")
    val out = TextOps.blocklistScreen(tiny, Seq(
      ("a", Seq("bad"), 2), ("b", Seq("ugly"), 1))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((0L, 0L, true)))
    assert(out(2L) == ((2L, 1L, false))) // both categories trip
    assert(out(3L) == ((1L, 0L, true)))  // below both thresholds
  }

  test("canonical dedup collapses case/punct variants exact dedup keeps apart") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val out = Dedup.canonicalDedup(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    // 1, 2, 3 share a canonical form; min doc_id survives.
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1)
    assert(out(1L)._2 && !out(2L)._2 && !out(3L)._2)
    assert(out(4L)._2 && out(4L)._1 != out(1L)._1)
    // Canonical collapses at least as much as exact on the corpus.
    val exactGroups = docs.select(md5(col("text"))).distinct().count()
    val canonGroups = Dedup.canonicalDedup(docs)
      .select(col("canon_md5")).distinct().count()
    assert(canonGroups <= exactGroups)
  }

  test("bigram_bucket_counts matches the composed md5/conv form bucket by bucket") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val toks = docs.limit(50)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val kernel = toks
      .select(col("doc_id"), explode(expr("bigram_bucket_counts(toks, 64)")).as(Seq("b", "c")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val composed = toks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("bg"))
      .select(col("doc_id"),
        (conv(substring(md5(col("bg")), 1, 14), 16, 10).cast("long") % 64).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(kernel == composed,
      s"diff: ${(kernel.toSet diff composed.toSet) ++ (composed.toSet diff kernel.toSet)}")
  }

  test("exactly-N sample is stable under corpus growth") {
    val all = docs.select(col("doc_id"), col("lang"), col("source"))
    val n = 50
    val first = graft.ops.Sampling.sampleExactlyN(all, n, col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(first.size == n)
    // Sampling from HALF the corpus yields a subset relation the other
    // way: every doc sampled from the full corpus that lives in the half
    // must also be sampled from the half (stability under growth).
    val half = all.filter(col("doc_id") % 2 === 0)
    val halfSample = graft.ops.Sampling.sampleExactlyN(half, n, col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    first.filter(_ % 2 == 0).foreach { id =>
      assert(halfSample.contains(id), s"doc $id dropped when the corpus shrank")
    }
  }

  test("exactly-N sample: TakeOrdered and GlobalRank routes return the identical row set") {
    val all = docs.select(col("doc_id"), col("lang"), col("source"))
    val n = 50
    // Force each route at the same n by moving the boundary around it.
    val viaTakeOrdered = graft.ops.Sampling.sampleExactlyN(all, n, col("doc_id"),
      driverSafeN = n)
    val viaGlobalRank = graft.ops.Sampling.sampleExactlyN(all, n, col("doc_id"),
      driverSafeN = n - 1)
    val a = viaTakeOrdered.collect().map(_.getLong(0)).toSet
    val b = viaGlobalRank.collect().map(_.getLong(0)).toSet
    assert(a == b, s"routes disagree: ${(a diff b) ++ (b diff a)}")
    assert(a.size == n)
    // Schemas match too — the distributed route must not leak helper cols.
    assert(viaTakeOrdered.columns.toSeq == viaGlobalRank.columns.toSeq)
    // And the plans really differ: driver-merge head vs range exchange.
    val pTake = viaTakeOrdered.queryExecution.executedPlan.toString
    val pRank = viaGlobalRank.queryExecution.executedPlan.toString
    assert(pTake.contains("TakeOrderedAndProject"), pTake.linesIterator.take(6).mkString("\n"))
    assert(!pRank.contains("TakeOrderedAndProject"), pRank.linesIterator.take(6).mkString("\n"))
  }

  test("zipf card: hand-checked regression over a known rank-frequency ladder") {
    import spark.implicits._
    // tf = 8, 4, 2, 1 -> ranks 1..4; x = floor(log2 rank) = 0,1,1,2;
    // y = floor(log2 tf) = 3,2,1,0. n=4 sx=4 sy=6 sxy=3 sxx=6:
    // num = 4*3 - 4*6 = -12, den = 4*6 - 16 = 8, slope = -1.5.
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val r = graft.ops.Report.zipfCard(d).collect()(0)
    assert(r.getLong(0) == 4L)
    // num/den are emitted as decimal STRINGS (dtype-stable across engines).
    assert(r.getString(1) == "-12")
    assert(r.getString(2) == "8")
    assert(r.getDouble(3) == -1.5)
  }

  test("calibration card: bins partition the corpus; rates are exact cleared integers") {
    val card = graft.ops.Report.calibrationCard(docs).collect()
    val total = docs.filter(org.apache.spark.sql.functions
      .size(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lower(col("text")), " ")) > 0).count()
    assert(card.map(_.getLong(1)).sum == total, "bins must partition the corpus")
    card.foreach { r =>
      val (bin, n, pos, rate) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bin >= 0 && bin < 8, s"bin $bin out of range")
      assert(pos <= n)
      assert(rate == (pos << 20) / n, s"rate mismatch at bin $bin")
    }
  }

  test("integrity card counts missing pairs both ways and duplicate ids") {
    import spark.implicits._
    val d = Seq(1L, 2L, 3L, 3L).toDF("doc_id")
    val v = Seq(2L, 4L, 4L, 4L).toDF("vec_id")
    val r = graft.ops.Report.integrityCard(d, v).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)        // n_docs, n_vecs
    assert(r.getLong(2) == 3L)  // docs 1, 3, 3 have no vector
    assert(r.getLong(3) == 3L)  // vectors 4, 4, 4 have no doc
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L)        // one dup id each
  }

  test("ann recall card: full probe is perfect recall, fewer probes only lose") {
    // nprobe = cells probes every cell -> candidates == whole corpus ->
    // IVF equals brute force and every query's recall is exactly 1.0.
    val full = Similarity.annRecallCard(emb, 5, 16, 16, 8).collect()
    assert(full.length == 8)
    assert(full.forall(_.getLong(2) == 1048576L), full.mkString("\n"))
    // Recall is monotone in nprobe (per query, candidates only grow).
    val p1 = Similarity.annRecallCard(emb, 5, 1, 16, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p4 = Similarity.annRecallCard(emb, 5, 4, 16, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    p1.keySet.foreach(q => assert(p1(q) <= p4(q), s"query $q"))
    assert(p1.values.forall(h => h >= 0 && h <= 5))
  }

  test("curriculum interleave is round-robin with early source exhaustion") {
    val out = graft.ops.Sampling.curriculumInterleave(
      docs, col("source"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pos is a permutation of 1..N.
    assert(out.map(_._4).sorted.toSeq == (1L to out.length))
    // Global order is lexicographic on (rs, source): every round's block
    // lists its sources in order, smaller sources exhaust early.
    val byPos = out.sortBy(_._4)
    byPos.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 < b._3 || (a._3 == b._3 && a._2 <= b._2), s"$a !<= $b")
      case _ => ()
    }
    // Within a source, rs is 1..n_source with no gaps.
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), src)
    }
  }

  test("curriculum interleave on an empty input returns an empty frame, not a parse error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    val out = graft.ops.Sampling.curriculumInterleave(
      empty, col("source"), col("doc_id"))
    assert(out.columns.toSeq == Seq("id", "source", "rs", "pos"))
    assert(out.count() == 0L)
  }

  test("bm25 top-k folded and joined paths agree bit-for-bit") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple apple banana kiwi"),
      (2L, "apple"),
      (3L, "banana cherry kiwi kiwi"),
      (4L, "cherry"),
      (5L, "plum plum plum")).toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("apple", "banana"), 1L -> Seq("cherry"),
      2L -> Seq("kiwi", "plum", "apple"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))).sortBy(t => (t._1, t._3))
    val folded = rows(TextOps.bm25TopKFolded(tiny, queries, 3, 1.2, 0.75))
    val joined = rows(TextOps.bm25TopKJoined(tiny, queries, 3, 1.2, 0.75))
    assert(folded.nonEmpty && folded.toSeq == joined.toSeq)
  }

  test("bm25 top-k with no queries returns an empty typed frame, not an analysis error") {
    import spark.implicits._
    val tiny = Seq((1L, "apple")).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(tiny, Seq.empty)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "rnk", "bm25"))
    assert(out.count() == 0L)
    val out2 = TextOps.bm25TopK(tiny, Seq(0L -> Seq.empty))
    assert(out2.count() == 0L)
    // An EMPTY CORPUS also yields the typed empty frame on both paths.
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out3 = TextOps.bm25TopK(none, Seq(0L -> Seq("apple")))
    assert(out3.columns.toSeq == Seq("query_id", "doc_id", "rnk", "bm25"))
    assert(out3.count() == 0L)
  }

  test("source overlap matrix: identical sources read 1.0, disjoint 0, all pairs present") {
    import spark.implicits._
    val textA = (1 to 30).map(i => s"alpha$i beta$i gamma$i delta$i").mkString(" ")
    val textB = (1 to 30).map(i => s"omega$i psi$i chi$i phi$i").mkString(" ")
    val d = Seq(
      (1L, "web", textA), (2L, "web", textA),
      (3L, "books", textA),          // books == web content
      (4L, "code", textB)).toDF("doc_id", "source", "text")
    val m = graft.ops.Dedup.sourceOverlapMatrix(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m.keySet == Set(("books", "web"), ("books", "code"), ("code", "web")))
    val (kBW, commonBW, jBW) = m(("books", "web"))
    assert(commonBW == kBW && jBW == (1L << 20), "identical sketch sets read 1.0")
    assert(m(("books", "code"))._3 == 0L && m(("code", "web"))._3 == 0L)
  }

  test("source overlap matrix: NULL sources degrade to the non-null pair matrix (r12 advice)") {
    import spark.implicits._
    val textA = (1 to 30).map(i => s"alpha$i beta$i gamma$i delta$i").mkString(" ")
    val d = Seq(
      (1L, Some("web"), textA), (2L, Some("books"), textA),
      (3L, Option.empty[String], textA)).toDF("doc_id", "source", "text")
    // Must not NPE in the driver-side sort/compare; the null-source doc
    // simply doesn't contribute a source row (the oracle's inner join
    // drops it the same way).
    val m = graft.ops.Dedup.sourceOverlapMatrix(d).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(m == Set(("books", "web")))
  }

  test("CacheScope: tracked persists release on demand, bounded-cache contract (r12 advice)") {
    import org.apache.spark.storage.StorageLevel
    // Idempotent on an empty registry.
    graft.ops.CacheScope.releaseCurrent()
    val df = graft.ops.CacheScope.persistTracked(spark.range(100).toDF("id"))
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "tracked df must be persisted")
    graft.ops.CacheScope.releaseCurrent()
    assert(df.storageLevel == StorageLevel.NONE,
      "releaseCurrent must unpersist everything tracked on this thread")
    // The ops route their intermediates through the scope: a consumed
    // perplexityBuckets leaves no cached entries behind once released.
    // (clearCache first so leftovers from OTHER tests on the shared
    // session can't fail the isEmpty assertion.)
    spark.catalog.clearCache()
    TextOps.perplexityBuckets(docs).collect()
    graft.ops.CacheScope.releaseCurrent()
    assert(spark.sharedState.cacheManager.isEmpty,
      "no persisted intermediates may survive a released query")
  }

  test("cluster-size histogram: hand-built clusters land in their bit buckets") {
    import spark.implicits._
    // 7 docs: {1,2,3} one cluster (size 3 -> bucket 1), {4,5} (size 2 ->
    // bucket 1), {6}, {7} singletons (bucket 0).
    val d = (1L to 7L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("i", "j")
    val h = graft.ops.DedupClusters.clusterSizeHistogram(d, pairs).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(h == Map(0 -> ((2L, 2L)), 1 -> ((2L, 5L))))
  }

  test("domain reweight: exact rational weights, monotone in excess surprisal") {
    val out = graft.ops.Sampling.domainReweight(docs).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    val den = out.map(_._4).sum
    out.foreach { case (_, _, excess, num, d) =>
      assert(d == den, "den must be the shared sum of numerators")
      assert(num == (1L << math.min(excess / 64, 32L)), "num = 2^min(excess/64, cap)")
    }
    // The minimum-rate source carries excess 0 and weight_num 1.
    assert(out.minBy(_._2)._3 == 0L && out.minBy(_._2)._4 == 1L)
    // Monotone: larger excess never gets a smaller numerator.
    out.sortBy(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._4)
      case _ => ()
    }
  }

  test("filtered ANN: only admitted labels appear; full admit + full probe == brute force") {
    val emb = graft.Tables.t(spark, sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 4)
    val admitted = Set(1L, 2L)
    val labelOf = emb.collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    val res = graft.ops.Similarity.filteredIvfTopK(emb, q, Seq(1, 2), 5, 4, 16).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(admitted.contains(labelOf(r.getLong(1))),
      s"vec ${r.getLong(1)} label ${labelOf(r.getLong(1))} not admitted"))
    // All labels admitted + probing every cell degrades to exact search.
    val all = labelOf.values.toSeq.distinct.map(_.toInt)
    val full = graft.ops.Similarity.filteredIvfTopK(emb, q, all, 5, 16, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val brute = graft.ops.Similarity.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    assert(full.toSeq == brute.toSeq)
  }

  test("dup-ngram card: hand-checked duplicate bigram occurrences, bytes, verdict") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b a b c"),     // pairs: "a b"x2, "b a", "b c" -> dup occ 2, bytes 2*3
      (2L, "x y z"),         // no duplicate pair
      (3L, "w w w w w w"),   // "w w"x5 -> all 5 occurrences duplicated
      (4L, "solo")).toDF("doc_id", "text") // <2 tokens: excluded
    val r = TextOps.dupNgramStats(tiny).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4))))
      .toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == ((4L, 2L, 6L, false)))  // 2*5=10 > 4
    assert(r(2L) == ((2L, 0L, 0L, true)))
    assert(r(3L) == ((5L, 5L, 15L, false)))
  }

  test("charset entropy separates clean prose from mixed-class noise") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "just lowercase words here"),       // letters + spaces only
      (2L, "a1b2c3 d4e5f6 90210 #$%&! xx99"),  // heavy class mixing
      (3L, "")).toDF("doc_id", "text")
    val out = TextOps.charsetEntropy(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(3L)) // empty docs excluded
    // Hand-check doc 1: n=25, letters=21, spaces=3, digits=0, other=1(the 'j'..?)
    // Recompute independently instead of hand-counting:
    def bitsOf(text: String): (Long, Long) = {
      val n = text.length.toLong
      val k1 = text.count(_.isLetter).toLong
      val k2 = text.count(_.isDigit).toLong
      val k3 = text.count(_ == ' ').toLong
      val k4 = n - k1 - k2 - k3
      def b(k: Long) = if (k > 0) k * (63 - java.lang.Long.numberOfLeadingZeros(n / k)) else 0L
      (n, b(k1) + b(k2) + b(k3) + b(k4))
    }
    assert(out(1L) == bitsOf("just lowercase words here"))
    assert(out(2L) == bitsOf("a1b2c3 d4e5f6 90210 #$%&! xx99"))
    // Mixed-class text scores strictly higher per char than clean prose.
    val r1 = out(1L)._2.toDouble / out(1L)._1
    val r2 = out(2L)._2.toDouble / out(2L)._1
    assert(r2 > r1, s"noise rate $r2 should exceed prose rate $r1")
  }

  test("trajectories: total order under ts ties, cap truncates the hashed prefix") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:05:00")
    // Two events share ts -> event_id must break the tie.
    val ev = Seq((t0, 2L, 9L, "b"), (t0, 1L, 9L, "a"), (t1, 3L, 9L, "c"))
      .toDF("ts", "event_id", "user_id", "event_type")
    val full = graft.ops.Funnels.trajectories(ev).collect()(0)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(full.getLong(1) == 3L)
    assert(full.getAs[String]("traj_md5") == m("a|b|c"))
    assert(full.getAs[java.sql.Timestamp]("first_ts") == t0)
    assert(full.getAs[java.sql.Timestamp]("last_ts") == t1)
    val capped = graft.ops.Funnels.trajectories(ev, cap = 2).collect()(0)
    assert(capped.getAs[String]("traj_md5") == m("a|b"))
    assert(capped.getLong(1) == 3L) // count stays full; only the hash truncates
    assert(capped.getAs[Boolean]("truncated"))
    assert(!full.getAs[Boolean]("truncated"))
  }

  test("trajectories: one mega-user stays cap-bounded and matches the shuffled-order hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    // A bot-account shape: one user, many events, arriving in a shuffled
    // partition order. The cap-bounded aggregate must hash exactly the
    // first `cap` types in (ts, event_id) order, same as the full-collect
    // form would, without ever holding more than 2*cap entries.
    val n = 50000
    val cap = 64
    val ev = spark.range(n).select(
      timestamp_micros((col("id") * 7919L) % 1000000L * 1000000L).as("ts"),
      col("id").as("event_id"),
      org.apache.spark.sql.functions.lit(1L).as("user_id"),
      expr("concat('t', id % 5)").as("event_type"))
      .repartition(16)
    val r = graft.ops.Funnels.trajectories(ev, cap).collect()(0)
    assert(r.getLong(1) == n.toLong)
    assert(r.getAs[Boolean]("truncated"))
    // Reference hash from the exact same rows via a driver-side sort.
    val first = ev.collect().map(x => (x.getTimestamp(0).getTime, x.getLong(1), x.getString(3)))
      .sortBy(t => (t._1, t._2)).take(cap).map(_._3)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getAs[String]("traj_md5") == m(first.mkString("|")))
  }

  test("corpus overlap sketch: exact at the extremes, close on the corpus") {
    import spark.implicits._
    // Identical halves -> sketches coincide -> estimate exactly 1.0.
    val same = (0L until 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val one = Dedup.corpusOverlapSketch(same, 3, 64).collect()(0)
    assert(one.getLong(2) == one.getLong(0) && one.getLong(3) == 1048576L)
    // Disjoint halves -> zero common minima.
    val disj = (0L until 8L).map { i =>
      (i, if (i % 2 == 0) "a b c d e f g" else "p q r s t u v")
    }.toDF("doc_id", "text")
    assert(Dedup.corpusOverlapSketch(disj, 3, 64).collect()(0).getLong(2) == 0L)
    // Corpus: the k=256 estimate lands near the exact hash-space Jaccard
    // (KMV error ~ 1/sqrt(k) ~ 6%; assert a loose 0.15 band).
    val sh = Dedup.shingles(docs, 3)
    val ha = sh.filter(col("doc_id") % 2 === 0)
      .select(graft.ops.Sampling.h56(col("shingle")).as("h")).distinct()
    val hb = sh.filter(col("doc_id") % 2 === 1)
      .select(graft.ops.Sampling.h56(col("shingle")).as("h")).distinct()
    val inter = ha.intersect(hb).count().toDouble
    val uni = ha.union(hb).distinct().count().toDouble
    val est = Dedup.corpusOverlapSketch(docs, 3, 256).collect()(0)
      .getLong(3).toDouble / 1048576.0
    assert(math.abs(est - inter / uni) < 0.15, s"est $est vs exact ${inter / uni}")
  }

  test("image decode reverses Average and Paeth filters the fixtures never emit") {
    import spark.implicits._
    // Hand-encode a 3x2 grayscale PNG using filter 3 (Average) on row 0
    // and 4 (Paeth) on row 1, then assert the decoded statistics — this
    // exercises the PNG §6 filter set beyond the synthesized 0/1/2.
    val px = Array(Array(10, 200, 30), Array(40, 5, 250))
    val w = 3; val h = 2
    val raw = new java.io.ByteArrayOutputStream()
    raw.write(3) // Average: v - floor((left + up) / 2), up = 0 on row 0
    var left = 0
    for (x <- 0 until w) { raw.write((px(0)(x) - (left + 0) / 2) & 0xff); left = px(0)(x) }
    raw.write(4) // Paeth
    for (x <- 0 until w) {
      val a = if (x > 0) px(1)(x - 1) else 0
      val b = px(0)(x)
      val c = if (x > 0) px(0)(x - 1) else 0
      val p = a + b - c
      val pred =
        if (math.abs(p - a) <= math.abs(p - b) && math.abs(p - a) <= math.abs(p - c)) a
        else if (math.abs(p - b) <= math.abs(p - c)) b else c
      raw.write((px(1)(x) - pred) & 0xff)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val buf = new Array[Byte](256); val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val head = graft.ops.MediaHeaders.synthPng(w, h)
    head(8 + 8 + 8 + 1) = 0 // grayscale
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    val idat = zout.toByteArray
    out.write((idat.length >>> 24) & 0xff); out.write((idat.length >>> 16) & 0xff)
    out.write((idat.length >>> 8) & 0xff); out.write(idat.length & 0xff)
    "IDAT".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    out.write(idat, 0, idat.length)
    (0 until 4).foreach(_ => out.write(0))
    val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
    val r = graft.ops.MediaHeaders.imageStats(spark, df).collect()(0)
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) == px.flatten.sum.toLong)
    assert(r.getInt(3) == 5 && r.getInt(4) == 250)
    // Garbage degrades to an empty decode, not a crash.
    val junk = Seq((2L, Array[Byte](0x89.toByte, 1, 2))).toDF("doc_id", "payload")
    val z = graft.ops.MediaHeaders.imageStats(spark, junk).collect()(0)
    assert(z.getLong(1) == 0L && z.getInt(3) == -1)
  }

  test("video decode: y4m planes decode exactly; C420 stride; malformed keeps prior frames") {
    import spark.implicits._
    // Hand-check: id=3, 4x3, 2 frames, C444 — replay the pixel formula.
    val b = graft.ops.MediaHeaders.synthY4m(3L, 4, 3, 2)
    val df = Seq((3L, b)).toDF("doc_id", "payload")
    val r = graft.ops.MediaHeaders.videoFrameStats(spark, df).collect()
      .map(x => x.getInt(1) -> ((x.getLong(4), x.getInt(5), x.getInt(6)))).toMap
    def ys(f: Int) = (0 until 12).map(p => ((3 * 31 + f * 17 + p * 7) % 256))
    assert(r.keySet == Set(0, 1))
    (0 to 1).foreach(f =>
      assert(r(f) == ((ys(f).map(_.toLong).sum, ys(f).min, ys(f).max)), s"frame $f"))
    // C420 with even dims: hand-build header + one frame with known planes.
    val out = new java.io.ByteArrayOutputStream()
    out.write("YUV4MPEG2 W4 H2 F25:1 C420jpeg\n".getBytes("US-ASCII"))
    out.write("FRAME\n".getBytes("US-ASCII"))
    (1 to 8).foreach(out.write)            // Y: 1..8
    (0 until 2).foreach(_ => out.write(9)) // U: (4/2)*(2/2) = 2 bytes
    (0 until 2).foreach(_ => out.write(9)) // V
    out.write("FRAME\n".getBytes("US-ASCII"))
    (11 to 18).foreach(out.write)
    (0 until 4).foreach(_ => out.write(0))
    val r420 = graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((5L, out.toByteArray)).toDF("doc_id", "payload")).collect()
      .map(x => (x.getInt(1), x.getLong(4), x.getInt(5), x.getInt(6))).sortBy(_._1)
    assert(r420.toSeq == Seq((0, 36L, 1, 8), (1, 116L, 11, 18)))
    // Truncated second frame: the first decoded frame survives.
    val cut = b.take(b.length - 5)
    val rc = graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((3L, cut)).toDF("doc_id", "payload")).collect()
    assert(rc.map(_.getInt(1)).toSeq == Seq(0))
    // Non-y4m and odd-dimension C420 are honest empties.
    assert(graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).count() == 0)
    val odd = "YUV4MPEG2 W3 H3 C420\nFRAME\n".getBytes("US-ASCII") ++ Array.fill(20)(1.toByte)
    assert(graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((9L, odd)).toDF("doc_id", "payload")).count() == 0)
    // Hostile headers degrade to honest empties, never an exception or
    // a bogus row: a W digit-run past Int range, and a W*H product that
    // overflows Int (46341^2 < 0 in Int32) with a tiny payload.
    val hugeW = ("YUV4MPEG2 W99999999999 H4 C444\nFRAME\n" + "x" * 32).getBytes("US-ASCII")
    assert(graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((9L, hugeW)).toDF("doc_id", "payload")).count() == 0)
    assert(graft.ops.MediaHeaders.parse(9L, hugeW).fmt == "unknown")
    val ovf = ("YUV4MPEG2 W46341 H46341 C444\nFRAME\n" + "x" * 8).getBytes("US-ASCII")
    assert(graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((9L, ovf)).toDF("doc_id", "payload")).count() == 0)
    // Step sampling keeps frames 0, step, 2*step...
    val many = graft.ops.MediaHeaders.synthY4m(1L, 4, 3, 7)
    val rs = graft.ops.MediaHeaders.videoFrameStats(spark,
      Seq((1L, many)).toDF("doc_id", "payload"), step = 3).collect()
    assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6))
    // Header sniff surfaces in parse().
    assert(graft.ops.MediaHeaders.parse(1L, b).fmt == "y4m")
  }

  test("mjpeg decode: real Huffman+IDCT round-trip; AC paths; malformed keeps prior frames") {
    import spark.implicits._
    import graft.ops.Mjpeg
    // Round-trip the closed form: id=5 → 16x16, 1 frame (5%5=0... use
    // id=3: w=(3%3+1)*8=8, h=(3%2+1)*8=16, frames=3%5+1=4. Blocks per
    // frame: 1*2=2.
    val b = Mjpeg.synthMjpegAvi(3L, 8, 16, 4)
    val r = Mjpeg.aviFrameStats(spark, Seq((3L, b)).toDF("doc_id", "payload"))
      .collect().map(x => x.getInt(1) ->
        ((x.getInt(2), x.getInt(3), x.getLong(4), x.getInt(5), x.getInt(6)))).toMap
    assert(r.keySet == Set(0, 1, 2, 3))
    def pix(f: Int, blk: Int): Int = 128 + 8 * ((((3L * 31 + f * 17 + blk * 7) % 17) - 8).toInt)
    (0 to 3).foreach { f =>
      val vs = Seq(pix(f, 0), pix(f, 1))
      assert(r(f) == ((8, 16, 64L * vs.sum, vs.min, vs.max)), s"frame $f")
    }
    // The general decoder path beyond the synthesized subset: a
    // hand-coded JPEG with a NONZERO AC coefficient must decode through
    // the run/size + magnitude-extension + zig-zag + IDCT path. One 8x8
    // block, DC=0, AC(0,1)=17 (zig-zag index 1, run 0, size 5):
    // f(x,y) = (1/4) * c(1) * 17 * cos((2x+1)π/16) — compare against an
    // independently computed expectation.
    val probe = Mjpeg.synthJpegFlatBlocks(8, 8, _ => 0)
    // Rewrite the entropy segment: categories for DC 0 (code from the
    // stream's own table) followed by AC run 0/size 5, value 17, EOB.
    // Easier: decode a stream the encoder cannot emit by building it
    // through the same writer via a tiny local re-encode.
    val out = new java.io.ByteArrayOutputStream()
    out.write(probe, 0, probe.indexOfSlice(Seq(0xff.toByte, 0xda.toByte)))
    // SOS + entropy for one block: DC size 0, AC (run 0, size 5) -> 17, EOB.
    out.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0, 0, 63, 0), 0, 10)
    // Bits: DC cat0 code "00" (2 bits); AC symbol 0x05 ("11010", 5 bits);
    // 17 = "10001" (5 bits); EOB "1010" (4 bits) = 16 bits total.
    out.write(Integer.parseInt("00110101", 2))
    out.write(Integer.parseInt("00011010", 2))
    out.write(0xff); out.write(0xd9)
    val dec = Mjpeg.decodeJpegGrayStats(out.toByteArray)
    assert(dec.isDefined)
    val (w8, h8, sum8, mn8, mx8) = dec.get
    val want = for (y <- 0 until 8; x <- 0 until 8) yield {
      val v = StrictMath.round(
        0.25 * 0.7071067811865476 * 17 *
          StrictMath.cos((2 * x + 1) * StrictMath.PI / 16) + 128).toInt
      math.max(0, math.min(255, v))
    }
    assert((w8, h8) == ((8, 8)))
    assert((sum8, mn8, mx8) == ((want.map(_.toLong).sum, want.min, want.max)))
    // Truncated mid-movi: earlier frames survive, the cut frame does not.
    val frames = Mjpeg.aviFrameStats(spark,
      Seq((3L, b.take(b.length - 10))).toDF("doc_id", "payload")).collect()
    assert(frames.length == 3 && frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
    // Non-AVI and RIFF-but-not-AVI are honest empties.
    assert(Mjpeg.aviFrameStats(spark,
      Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).count() == 0)
    val wav = graft.ops.MediaHeaders.synthWav(8000, 16, 1)
    assert(Mjpeg.aviFrameStats(spark,
      Seq((1L, wav)).toDF("doc_id", "payload")).count() == 0)
    // The container sniff reads the avih main header (w, h, frames in
    // the channels slot) and keeps WAV (also RIFF) distinct.
    val meta = graft.ops.MediaHeaders.parse(3L, b)
    assert((meta.fmt, meta.width, meta.height, meta.channels) == (("avi", 8, 16, 4)))
    assert(graft.ops.MediaHeaders.parse(3L, wav).fmt == "wav")
  }


  test("ycbcr 4:2:0 decode: interleaved MCUs, per-component tables/quant/predictors") {
    import spark.implicits._
    import graft.ops.Mjpeg
    // Round-trip the closed form: id=5 → w=(5%2+1)*16=32, h=(5%3+1)*16=48,
    // frames=5%4+1=2. Luma blocks 4*2*3=24 (MCU-scan order — the stats
    // are order-insensitive), chroma blocks 2*3=6 per plane.
    val b = Mjpeg.synthYcbcrAvi(5L, 32, 48, 2)
    val r = Mjpeg.aviColorFrameStats(spark, Seq((5L, b)).toDF("doc_id", "payload"))
      .collect().map(x => x.getInt(1) -> x).toMap
    assert(r.keySet == Set(0, 1))
    def kpix(a: Long, fm: Long, cm: Long)(f: Int, i: Int): Int =
      128 + 8 * ((((5L * a + f * fm + i * cm) % 17) - 8).toInt)
    (0 to 1).foreach { f =>
      val ys = (0 until 24).map(kpix(31, 17, 7)(f, _))
      val cbs = (0 until 6).map(kpix(13, 7, 5)(f, _))
      val crs = (0 until 6).map(kpix(7, 11, 3)(f, _))
      val x = r(f)
      assert((x.getInt(2), x.getInt(3)) == ((32, 48)), s"frame $f geometry")
      assert((x.getLong(4), x.getInt(5), x.getInt(6)) ==
        ((64L * ys.sum, ys.min, ys.max)), s"frame $f luma")
      assert((x.getLong(7), x.getInt(8), x.getInt(9)) ==
        ((64L * cbs.sum, cbs.min, cbs.max)), s"frame $f cb")
      assert((x.getLong(10), x.getInt(11), x.getInt(12)) ==
        ((64L * crs.sum, crs.min, crs.max)), s"frame $f cr")
    }
    // The chroma path really dequantizes against table 1 (all twos): a
    // stream whose chroma DC is 32 must decode to pixel 128 + 8 = 136,
    // which only holds if quant(0)=2 is applied (32*2/8 = 8).
    val one = Mjpeg.synthJpegYcbcr420(16, 16, _ => 0, _ => (1, -1))
    val d = Mjpeg.decodeJpegColorStats(one)
    assert(d.isDefined)
    val (w1, h1, ys1, ymn1, ymx1, cs1, cmn1, cmx1, rs1, rmn1, rmx1) = d.get
    assert((w1, h1) == ((16, 16)))
    assert((ys1, ymn1, ymx1) == ((256L * 128, 128, 128)))
    assert((cs1, cmn1, cmx1) == ((64L * 136, 136, 136))) // 8x8 chroma plane
    assert((rs1, rmn1, rmx1) == ((64L * 120, 120, 120)))
    // Truncated mid-movi keeps prior frames (shared walk posture).
    val cut = Mjpeg.aviColorFrameStats(spark,
      Seq((5L, b.take(b.length - 10))).toDF("doc_id", "payload")).collect()
    assert(cut.length == 1 && cut.head.getInt(1) == 0)
    // A gray (single-component) frame through the color decoder is an
    // honest None, and vice versa the gray decoder refuses color.
    val gray = Mjpeg.synthJpegFlatBlocks(8, 8, _ => 0)
    assert(Mjpeg.decodeJpegColorStats(gray).isEmpty)
    assert(Mjpeg.decodeJpegGrayStats(
      Mjpeg.synthJpegYcbcr420(16, 16, _ => 0, _ => (0, 0))).isEmpty)
  }

  test("mjpeg decode: DQT walk keeps table 0 regardless of packing order (ADVICE r14)") {
    import graft.ops.Mjpeg
    // A DQT segment may pack several tables in any order; the scan
    // references Tq = 0, so a stream that defines table 1 FIRST (or a
    // 16-bit table the parser must skip by its 129-byte width) must
    // still decode against table 0 — the r14 parse read only the first
    // table and would have silently used the wrong one.
    val probe = Mjpeg.synthJpegFlatBlocks(8, 8, _ => 1) // DC=64 → flat 136
    val want = Mjpeg.decodeJpegGrayStats(probe)
    assert(want.isDefined)
    // The synth DQT sits right after SOI: FF DB 00 43 00 + 64 ones.
    assert((probe(2) & 0xff) == 0xff && (probe(3) & 0xff) == 0xdb)
    val rest = probe.drop(2 + 4 + 65)
    def dqt(payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 2
      Array(0xff.toByte, 0xdb.toByte, ((len >> 8) & 0xff).toByte,
        (len & 0xff).toByte) ++ payload
    }
    val ones = Array.fill(64)(1.toByte)
    // (a) 8-bit table 1 (all 2s — would double every pixel delta) packed
    // before table 0; (b) 16-bit table 1 first (skip width 129).
    val t1First = dqt(Array(0x01.toByte) ++ Array.fill(64)(2.toByte) ++
      Array(0x00.toByte) ++ ones)
    val t1Wide = dqt(Array(0x11.toByte) ++ Array.fill(128)(2.toByte) ++
      Array(0x00.toByte) ++ ones)
    for (seg <- Seq(t1First, t1Wide)) {
      val got = Mjpeg.decodeJpegGrayStats(probe.take(2) ++ seg ++ rest)
      assert(got == want, s"seg len ${seg.length}")
    }
    // A truncated second table is malformed, not a crash.
    assert(Mjpeg.decodeJpegGrayStats(
      probe.take(2) ++ dqt(Array(0x01.toByte) ++ Array.fill(64)(2.toByte) ++
        Array(0x00.toByte) ++ ones.take(10)) ++ rest).isEmpty)
  }

  test("audio stats: real chunk walk survives junk chunks and odd sizes") {
    import spark.implicits._
    // Hand-build: RIFF/WAVE + fmt + an odd-sized junk chunk (forces the
    // 2-byte alignment rule) + data with samples [100, -200, 300].
    val out = new java.io.ByteArrayOutputStream()
    val head = graft.ops.MediaHeaders.synthWav(8000, 16, 1)
    out.write(head, 0, head.length)
    "JUNK".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    out.write(3); out.write(0); out.write(0); out.write(0) // odd size 3
    out.write(1); out.write(2); out.write(3); out.write(0) // 3 bytes + pad
    "data".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    out.write(6); out.write(0); out.write(0); out.write(0)
    for (s <- Seq(100, -200, 300)) { out.write(s & 0xff); out.write((s >>> 8) & 0xff) }
    val df = Seq((7L, out.toByteArray)).toDF("doc_id", "payload")
    val r = graft.ops.MediaHeaders.audioStats(spark, df).collect()(0)
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 100L * 100 + 200L * 200 + 300L * 300)
    assert(r.getInt(3) == 300)
    // Non-WAV bytes degrade to zeros, not a crash.
    val junk = Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val z = graft.ops.MediaHeaders.audioStats(spark, junk).collect()(0)
    assert(z.getLong(1) == 0L && z.getLong(2) == 0L && z.getInt(3) == 0)
    // A negative (high-bit) chunk size must terminate as malformed with
    // zero stats — the naive walk steps i += 8 + sz and never advances
    // (sz = -8), hanging the executor thread forever.
    val bad = new java.io.ByteArrayOutputStream()
    val h2 = graft.ops.MediaHeaders.synthWav(8000, 16, 1)
    bad.write(h2, 0, h2.length)
    "data".getBytes("US-ASCII").foreach(b => bad.write(b.toInt))
    bad.write(0xf8); bad.write(0xff); bad.write(0xff); bad.write(0xff) // sz = -8
    for (s <- Seq(100, -200)) { bad.write(s & 0xff); bad.write((s >>> 8) & 0xff) }
    val badDf = Seq((9L, bad.toByteArray)).toDF("doc_id", "payload")
    val m = graft.ops.MediaHeaders.audioStats(spark, badDf).collect()(0)
    assert(m.getLong(1) == 0L && m.getLong(2) == 0L && m.getInt(3) == 0)
  }

  test("robust dim stats: hand-checked median/MAD, lower-median rank rule") {
    import spark.implicits._
    // dim 0: [1,2,3,4,5] -> med 3, |x-3| = [2,1,0,1,2] -> mad 1.
    // dim 1: [10,20,30,40,50] with an outlier 1000 replacing 50 ->
    //        [10,20,30,40,1000]: med 30 (rank ceil(2.5)=3), mad = med of
    //        [20,10,0,10,970] = 10 — the outlier moves neither statistic.
    val tiny = Seq(
      (0L, Seq(1f, 10f)), (1L, Seq(2f, 20f)), (2L, Seq(3f, 30f)),
      (3L, Seq(4f, 40f)), (4L, Seq(5f, 1000f))).toDF("vec_id", "embedding")
    val got = Quantiles.robustDimStats(tiny, 2).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(0) == ((3.0, 1.0)))
    assert(got(1) == ((30.0, 10.0)))
    // Even count takes the LOWER median: [1,2,3,4] -> 2.
    val even = Seq((0L, Seq(1f)), (1L, Seq(2f)), (2L, Seq(3f)), (3L, Seq(4f)))
      .toDF("vec_id", "embedding")
    assert(Quantiles.robustDimStats(even, 1).collect()(0).getDouble(1) == 2.0)
    // Corpus: 64 rows, MAD non-negative, med within per-dim min/max.
    val out = Quantiles.robustDimStats(emb).collect()
    assert(out.length == 64)
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("per-group cap equals the window formulation, tie-broken on id") {
    val viaHeap = graft.ops.Sampling.capPerGroup(docs,
      col("source"), "source", col("n_chars"), col("doc_id"), 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 7)
      .select(col("source"), col("doc_id"), col("rnk").cast("int")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaHeap == viaWindow)
    assert(viaHeap.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).toSeq.sorted == (1 to rs.size)
    })
  }

  test("power iteration recovers an exactly dominant axis; corpus invariants hold") {
    import spark.implicits._
    // Every vector lies exactly on axis 2 -> the direction is e2 and the
    // explained fraction is exactly 1.0 (identical fold order on both
    // sides of the division).
    val axis = Seq.tabulate(6) { i =>
      (i.toLong, Seq.tabulate(8)(d => if (d == 2) (i + 1).toFloat else 0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.topSingularDirection(axis, 2, 8, 2).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2)))).toMap
    (0 until 8).foreach { p =>
      assert(got(p)._1 == (if (p == 2) 1.0 else 0.0), s"pos $p")
    }
    assert(got(0)._2 == 1.0)
    // Corpus: unit-norm loadings, fraction in (0, 1].
    val out = Similarity.topSingularDirection(emb, 2).collect()
    assert(out.length == 64)
    val nrm2 = out.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(nrm2 - 1.0) < 1e-12, s"norm^2 = $nrm2")
    val fr = out.head.getDouble(2)
    assert(fr > 0.0 && fr <= 1.0, s"fraction = $fr")
  }

  test("all-but-the-top: exact mean, dominant centered axis removed exactly (r13)") {
    import spark.implicits._
    // Vectors vary ONLY along dim 0 (values 0..19), constant 5 elsewhere:
    // mean = (9.5, 5, 5, ...), the centered data lies exactly on e0, so
    // the removed direction is ±e0, removed_fraction is exactly 1.0, and
    // every post-processed vector is exactly the zero vector — sum_after
    // must be 0.0 EXACTLY in every dimension (c - (±c0)(±1) cancels in
    // IEEE for axis-aligned data).
    val d = Seq.tabulate(20) { i =>
      (i.toLong, Seq.tabulate(8)(p => if (p == 0) i.toFloat else 5f))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.allButTheTop(d, 2, 8, 2).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(rows.size == 8)
    (0 until 8).foreach { p =>
      val (m, ld, sa, fr) = rows(p)
      assert(m == (if (p == 0) 9.5 else 5.0), s"mean pos $p = $m")
      assert(math.abs(ld) == (if (p == 0) 1.0 else 0.0), s"loading pos $p = $ld")
      assert(sa == 0.0, s"sum_after pos $p = $sa")
      assert(fr == 1.0, s"removed_fraction = $fr")
    }
    // Fixture corpus: unit-norm removed direction, fraction in (0, 1],
    // and the post-processed per-dim sums are the float residue of an
    // exact cancellation — tiny relative to the corpus scale.
    val out = Similarity.allButTheTop(emb, 2).collect()
    assert(out.length == 64)
    val nrm2 = out.map(r => r.getDouble(2) * r.getDouble(2)).sum
    assert(math.abs(nrm2 - 1.0) < 1e-12, s"norm^2 = $nrm2")
    val fr = out.head.getDouble(4)
    assert(fr > 0.0 && fr <= 1.0, s"fraction = $fr")
  }

  test("leakage-safe split: copies co-fold, partition is complete, leaks replay (r13)") {
    import spark.implicits._
    val d = Seq(
      (1L, "Hello, World!", "en", "web", 13L),
      (2L, "hello  world", "en", "books", 12L),   // same canonical form as 1
      (3L, "a different document entirely", "en", "web", 29L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ops.Sampling.leakageSafeSplit(d, 5).collect()
    // Exact/re-punctuated copies are keyed by content: zero canonical
    // hashes span folds, and the (fold, source) counts partition the
    // corpus completely.
    assert(rows.map(_.getLong(4)).distinct.sameElements(Array(0L)))
    assert(rows.map(_.getLong(2)).sum == 3L)
    // Docs 1 and 2 share a canonical hash -> identical fold by
    // construction (fold is a function of the canon alone).
    val cmap = graft.ops.Dedup.canonicalDedup(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cmap(1L) == cmap(2L))
    // Fixture corpus: near_leak_pairs replays independently from the
    // banded candidates + the fold assignment.
    val out = graft.ops.Sampling.leakageSafeSplit(docs, 5).collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
    assert(out.map(_.getLong(4)).distinct.sameElements(Array(0L)))
    val folds = graft.ops.Sampling.leakageSafeSplit(docs, 5) // same hash rule
    val canon = md5(trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
    val fmap = docs.select(col("doc_id"),
      (conv(substring(md5(canon.cast("string")), 1, 14), 16, 10).cast("long") % 5)
        .cast("int").as("fold")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = graft.ops.Dedup.exactSubstringPairs(docs).collect()
      .count(r => fmap(r.getLong(0)) != fmap(r.getLong(1))).toLong
    assert(out.map(_.getLong(5)).distinct.sameElements(Array(expect)))
  }

  test("bm25 top-k retrieval: independent scoring replay + rank structure") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple apple banana"),
      (2L, "apple"),
      (3L, "banana cherry kiwi kiwi"),
      (4L, "cherry")).toDF("doc_id", "text")
    val queries = Seq(0L -> Seq("apple", "banana"), 1L -> Seq("cherry"))
    val got = TextOps.bm25TopK(tiny, queries, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3)))).toMap
    // Straight-line replay of the rational-idf BM25 in plain Scala.
    val toks = Map(1L -> Seq("apple", "apple", "banana"), 2L -> Seq("apple"),
      3L -> Seq("banana", "cherry", "kiwi", "kiwi"), 4L -> Seq("cherry"))
    val nDocs = 4.0
    val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
    def contrib(doc: Long, term: String): Double = {
      val tf = toks(doc).count(_ == term).toDouble
      if (tf == 0) 0.0
      else {
        val dfT = toks.values.count(_.contains(term)).toDouble
        (nDocs - dfT + 0.5) / (dfT + 0.5) * tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * toks(doc).size.toDouble / avgdl))
      }
    }
    for ((qid, terms) <- queries; doc <- toks.keys) {
      val want = terms.map(contrib(doc, _)).sum
      if (want > 0.0) assert(got((qid, doc))._2 == want, s"q$qid doc$doc")
      else assert(!got.contains((qid, doc)))
    }
    // Ranks are 1..n per query and scores non-increasing in rank order.
    for (qid <- queries.map(_._1)) {
      val rows = got.collect { case ((q, _), rs) if q == qid => rs }.toSeq.sortBy(_._1)
      assert(rows.map(_._1) == (1 to rows.size))
      assert(rows.map(_._2).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
    }
    // Corpus smoke: exactly k rows per query, all ranks contiguous.
    val corpus = TextOps.bm25TopK(docs,
      Seq(0L -> Seq("query", "join"), 1L -> Seq("scan", "filter")), 5).collect()
    assert(corpus.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getInt(2)).sorted.toSeq == (1 to 5)
    })
  }

  test("domain rank reproduces a fully independent JVM-md5 replay") {
    val d = 64
    val got = DomainRank.domainRank(docs, d, 3, 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // Independent replay: edges from java MessageDigest md5 (not Spark's
    // md5/conv), same h56 = first-14-hex-chars construction.
    def h56(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val edges = scala.collection.mutable.Map[(Int, Int), Long]().withDefaultValue(0L)
    for (id <- ids; j <- 1 to 3) {
      val s = (h56(id.toString) % d).toInt
      val t = (h56(s"$id:$j") % d).toInt
      if (s != t) edges((s, t)) += 1
    }
    val outDeg = new Array[Long](d)
    edges.foreach { case ((s, _), c) => outDeg(s) += c }
    val scale = 1000000000000L
    var pr = Array.fill(d)(scale / d)
    for (_ <- 1 to 3) {
      val next = Array.fill(d)(15L * scale / (100L * d))
      edges.foreach { case ((s, t), c) =>
        next(t) += c * (85L * pr(s) / (100L * outDeg(s)))
      }
      pr = next
    }
    assert(got.size == d)
    (0 until d).foreach { dom =>
      assert(got(dom.toLong) == ((outDeg(dom), pr(dom))), s"domain $dom")
    }
    // Rank mass never exceeds the fixed-point scale (floor losses + the
    // dangling-mass drop only shrink it) and every rank is at least base.
    assert(got.values.map(_._2).sum <= scale)
    assert(got.values.forall(_._2 >= 15L * scale / (100L * d)))
    // iters = 0 is the uniform prior.
    val uniform = DomainRank.domainRank(docs, d, 3, 0).collect()
    assert(uniform.forall(_.getLong(2) == scale / d))
  }
}
