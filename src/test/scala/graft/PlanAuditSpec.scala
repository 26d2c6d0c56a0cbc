package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level audits of the scale properties the corpus queries claim:
  * pushdown reaching the scan, pruned read schemas, broadcasts where a
  * side is dimension-sized, partial aggregation, whole-stage codegen, and
  * the ABSENCE of the single-reducer / cartesian shapes the operators
  * were specifically designed to avoid. Row-level correctness is the
  * oracle corpus's job; this pins the HOW.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private def plan(name: String): String =
    try SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString
    // Some operators persist at construction (lshTuningCard's isolation
    // persists; perplexityBuckets is persist-free as of r16); drain so a test's
    // build can't leak cached blocks into later tests' plan assertions.
    finally graft.ops.CacheScope.releaseCurrent()

  test("r15: surprisal-family construction launches zero Spark jobs (auto strategy)") {
    // VERDICT r14 #4: the "auto" strategy used to run a driver-side
    // count probe at DataFrame-CONSTRUCTION time, surprising plan-only
    // callers. Now the join is left unhinted (AQE picks at runtime from
    // the measured bits-stage size), so building any surprisal-family
    // DataFrame must launch no job. Jobs are observed via the status
    // tracker after a sentinel action flushes the (async) listener bus:
    // events arrive in order, so once the sentinel's job is visible, any
    // construction job would be too.
    val sc = spark.sparkContext
    // Count via a listener, not statusTracker.getJobIdsForGroup(null):
    // the group-filtered tracker only sees group-less jobs, so a
    // construction job launched under a job group (a future fixture
    // setting one) would be invisible and this guard would pass
    // vacuously. The listener sees every onJobStart (JobProbe pattern).
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    }
    sc.addSparkListener(listener)
    // The bus is async: poll until the count stops moving, so a job from
    // earlier setup (e.g. the parquet-footer read in Tables.t) can't
    // land inside the measured window and read as a construction job.
    def settled(): Int = {
      var prev = -1
      var cur = jobCount.get()
      while (cur != prev) { Thread.sleep(100); prev = cur; cur = jobCount.get() }
      cur
    }
    val docs = Tables.t(spark, sf0001, "documents")
    val before = settled()
    try {
      val built = Seq(
        graft.ops.TextOps.bigramSurprisal(docs),
        graft.ops.TextOps.perplexityBuckets(docs, 3, 20),
        graft.ops.Sampling.domainReweight(docs))
      assert(built.forall(_.columns.nonEmpty))
      // Sentinel: an RDD count is exactly ONE job (a DataFrame count
      // would be two under AQE — shuffle stage + final).
      sc.parallelize(Seq(1)).count()
      val after = settled()
      assert(after == before + 1,
        s"construction launched ${after - before - 1} unexpected job(s)")
    } finally {
      graft.ops.CacheScope.releaseCurrent() // defensive: nothing should be pinned here (r16: perplexityBuckets no longer persists)
      sc.removeSparkListener(listener)
    }
  }

  test("q02 filter+project: predicates pushed to parquet, columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.take(8).mkString("\n"))
    // The scan reads only referenced columns — a projection of 4 columns
    // must not drag the rest of lineitem through the reader.
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && !read.contains("l_comment"), read)
  }

  test("q03 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q03_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(5).mkString("\n"))
  }

  test("q05 star join broadcasts the dimension tables") {
    val p = plan("q05_star_join")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(8).mkString("\n"))
  }

  test("q01 aggregation is partial (map-side combine) inside codegen") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial"), p.linesIterator.take(10).mkString("\n"))
    // Codegen spans only appear once AQE finalizes the plan — execute,
    // then read the formatted explain.
    df.queryExecution.toRdd.count()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted.linesIterator.take(10).mkString("\n"))
  }

  test("ANN top-k ranks via the bounded-heap aggregate, not a per-query window") {
    val p = plan("p09_ann_topk")
    assert(!p.contains("Window"), p.linesIterator.take(10).mkString("\n"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("distributed prefix sum: data rows never funnel through one reducer") {
    val p = plan("p30_seq_pack")
    // The DATA branch runs a per-partition window (keyed by __pid) joined
    // against broadcast offsets. A single-partition exchange is allowed
    // ONLY on the offsets branch, whose input is the per-partition sums —
    // #partitions rows of metadata, not data. A naive
    // `SUM OVER (ORDER BY)` would instead funnel every data row through
    // one reducer.
    assert(p.contains("windowspecdefinition(__pid"), "expected the per-partition window")
    val lines = p.linesIterator.toIndexedSeq
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
      case (_, i) =>
        val subtree = lines.slice(i + 1, i + 6).mkString("\n")
        assert(subtree.contains("HashAggregate") && subtree.contains("__pid"),
          s"single-partition exchange not fed by the per-partition sums:\n$subtree")
    }
  }

  test("simhash and LSH candidate paths carry no cartesian product") {
    for (q <- Seq("p06_simhash_pairs", "p07_simhash_banded",
        "p04_dedup_minhash_lsh", "p11_ann_lsh_candidates")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("bloom decontamination probes the sketch below the shuffle") {
    val p = plan("p40_decontam_bloom")
    // The codegen'd probe must appear in a Filter BEFORE any Exchange —
    // assert it exists and that at least one scan-side filter mentions it.
    assert(p.contains("bloom_might_contain") || p.contains("BloomMightContain"),
      p.linesIterator.take(12).mkString("\n"))
  }

  test("shuffle shards rank through range repartition, never one reducer") {
    val p = plan("p57_shuffle_shards")
    // The permutation rank must come from GlobalRank's range exchange;
    // any single-partition exchange may only carry the per-partition
    // count rows (metadata), recognizably fed by a HashAggregate on __pid.
    assert(p.contains("Exchange rangepartitioning"),
      p.linesIterator.take(10).mkString("\n"))
    val lines = p.linesIterator.toIndexedSeq
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
      case (_, i) =>
        val subtree = lines.slice(i + 1, i + 6).mkString("\n")
        assert(subtree.contains("HashAggregate") && subtree.contains("__pid"),
          s"single-partition exchange not fed by per-partition counts:\n$subtree")
    }
  }

  test("tfidf cosine and edit-distance verification join candidates, no cartesian") {
    for (q <- Seq("p60_tfidf_cosine", "p55_editdist_pairs")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      // A nested-loop join is allowed ONLY as the 1-row n_docs broadcast
      // (a scalar constant riding a cross join); any data-sized one is the
      // quadratic shape these ops exist to avoid.
      val lines = p.linesIterator.toIndexedSeq
      lines.zipWithIndex.filter(_._1.contains("BroadcastNestedLoopJoin")).foreach {
        case (_, i) =>
          val subtree = lines.slice(i + 1, i + 12).mkString("\n")
          assert(subtree.contains("count(1)") || subtree.contains("n_docs"),
            s"$q: nested-loop join not fed by the 1-row count:\n$subtree")
      }
    }
  }

  test("grouped top-k ranks over the aggregate, with partial map-side combine") {
    val p = plan("p61_top_terms_per_lang")
    // The window's input must be the (group, term) HashAggregate — the
    // corpus collapses before any sort — and that aggregate must combine
    // map-side (partial) so shuffle volume is vocabulary-, not corpus-sized.
    assert(p.contains("partial"), p.linesIterator.take(10).mkString("\n"))
    assert(p.contains("Window"), "expected the per-group rank window")
  }

  test("edit-distance verification DP is banded (threshold levenshtein)") {
    // The threshold form prunes DP cells beyond the maxDist off-diagonal
    // band — O(prefixLen * maxDist) per candidate instead of
    // O(prefixLen^2). The 3-arg call shows up in the plan's projection.
    val p = plan("p55_editdist_pairs")
    assert(p.contains("levenshtein(pa") && p.contains("Some(40)"),
      p.linesIterator.filter(_.contains("levenshtein")).mkString("\n"))
  }

  test("containment carries the set size on the exploded rows — no count join") {
    // One aggregate builds set + cardinality; n_sh rides the shingle rows
    // into the grouping key, so there is no second per-doc count
    // aggregate joined back in. Exactly 2 aggregate exchanges appear:
    // the collect_set and the (i, j, n_sh) intersection count (AQE may
    // re-list one as reused; count distinct exchange subtrees).
    val p = plan("p48_containment")
    assert(!p.contains("CartesianProduct"))
    val aggExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(aggExchanges <= 3, s"unexpected shuffle count $aggExchanges:\n" +
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("winnowing is a single codegen'd expression — no shuffle before the explode") {
    val df = SparkEntry.queries("p63_winnow_fingerprints")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("winnow_hashes"), p.linesIterator.take(8).mkString("\n"))
    // Row-local: scan -> project/generate only; any Exchange would mean
    // the selection stopped being map-only.
    assert(!p.contains("Exchange"), p.linesIterator.take(12).mkString("\n"))
  }

  test("tf-idf numerator is the codegen'd sorted merge-dot, not a lambda fold") {
    val p = plan("p60_tfidf_cosine")
    // The O(|a|+|b|) merge expression over term-sorted entry arrays; the
    // retired formulation (aggregate over map_entries with linear
    // element_at probes) must not reappear — it is O(|a|·|b|) per pair
    // and interpreted.
    assert(p.contains("sorted_dot_long"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("map_entries"), "interpreted map fold reappeared")
    assert(!p.contains("CartesianProduct"))
  }

  test("probe gradient step is one partial-combinable aggregate pass") {
    // The 100 TB claim for probe training is "a gradient step is a single
    // scan": one hash aggregate with map-side partials, no window, no
    // join, no second pass over the corpus.
    val p = plan("p71_linear_probe_step")
    assert(p.contains("partial"), p.linesIterator.take(10).mkString("\n"))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    // Exactly one aggregation (partial+final pair), not one per coefficient.
    assert(p.linesIterator.count(_.contains("HashAggregate")) <= 2, p)
  }

  test("corpus report: one-distinct aggregate path, no Expand, broadcast join") {
    // One countDistinct among plain aggs must plan as the two-level
    // single-distinct aggregate, NOT the multi-distinct Expand rewrite
    // (which would replicate the corpus scan per aggregate); the two
    // source-keyed relations are handfuls of rows and must broadcast-join.
    val p = plan("p73_corpus_report")
    assert(!p.contains("Expand"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semdedup: per-cell pair join, broadcast centroids, no cartesian") {
    // The quadratic cost must stay bounded per cell: pair generation is an
    // equi-join keyed on the cell (never a cartesian over the corpus), the
    // 16-row codebook broadcasts, and the survivor set comes from an
    // anti-join — no window anywhere.
    val p = plan("p74_semdedup")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("Window"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("surprisal: map-side-combinable aggregates, n_docs broadcasts") {
    // Both aggregates (per-(doc,term) tf and the per-doc sum) must have
    // map-side partials, and the 1-row n_docs relation must reach the
    // plan as a broadcast — the corpus is never on a build side.
    val p = plan("p75_surprisal_score")
    assert(p.contains("partial"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
  }

  test("event spikes: daily-relation stats, no window, no cartesian") {
    // The event log is scanned once into the (type, day) aggregate; the
    // per-type stats aggregate runs on that DAILY relation and joins
    // back — no window over raw events, no cartesian anywhere.
    val p = plan("p77_event_spikes")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
  }

  test("bigram lm: top-k contexts via TakeOrdered, not a global sort") {
    val p = plan("p78_bigram_lm")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(8).mkString("\n"))
    assert(!p.contains("Window"), p)
  }

  test("profiler: pruned per-column scans, single-distinct path, no Expand") {
    // Per-column union form over a columnar source: one FileScan per
    // profiled column, each pruned to EXACTLY that column (together they
    // read every profiled byte once — same bytes as a stacked scan,
    // without multiplying the row stream by the column count or boxing
    // values to strings), and every aggregate stays on the one-distinct
    // two-phase path (no multi-distinct Expand replication).
    val p = plan("p79_profile")
    assert(!p.contains("Expand"), p.linesIterator.take(12).mkString("\n"))
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.size == 7, p)
    // Each scan reads a single column: the ReadSchema struct has no comma.
    reads.foreach(r => assert(
      !r.substring(r.indexOf("ReadSchema")).contains(","), r))
  }

  test("bigram surprisal: row-local pairs, partial aggs, no cartesian") {
    // Pair generation must stay a Generate over the token array (no
    // positional self-join of the corpus), every count aggregate keeps
    // its map-side partial, and the vocabulary-bounded pair/context
    // tables join back without a cartesian or a window.
    val p = plan("p80_bigram_surprisal")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(p.contains("Generate"), p)
    // r12: the vocabulary-bounded bits table must BROADCAST onto the
    // corpus-sized pair stream — a ShuffledHashJoin/SortMergeJoin here
    // means the stream pays a full exchange again (the r11 p80/p90 cost).
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("perplexity buckets: no range sampler over the scored lineage, no single-reducer window") {
    // r15 bounded ntileByValue shape: the DATA windows partition by the
    // score value (a windowspec over data rows without a partitionBy
    // would be the single-reducer global NTILE); the only unpartitioned
    // window runs over the VALUE-COUNT relation (__nbv_v — cardinality-
    // bounded: 666 distinct values at sf0.1, 770 at 10×), which then
    // BROADCASTS onto the data pass. No range machinery anywhere (the
    // r12 prefixSum path cost p90 a 31-job cascade), and no cartesian.
    // r16: the scored relation is NOT persisted — both consumers must
    // share the per-doc scoring exchange via AQE ReusedExchange instead
    // (asserted below on the executed-after-action plan).
    val p = plan("p90_perplexity_buckets")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val (narrow, data) = specs.partition(_.contains("__nbv_v"))
    assert(narrow.nonEmpty && data.nonEmpty, specs.mkString("\n"))
    assert(data.forall(_.contains("ppl_scaled")), specs.mkString("\n"))
    assert(!p.contains("InMemoryRelation"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("RangePartitioning"), p)
    // The broadcast must be ntileByValue's narrow prefix relation — p90
    // also carries the bits-LM broadcast, so assert on the join whose
    // keys are the __nbv_v value column, not on any broadcast join.
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("__nbv_v")), p)
  }

  test("perplexity buckets: consumers REUSE the per-doc scoring exchange (r16)") {
    // The r16 persist removal relies on a plan-shape contract: the
    // counts branch and the window branch collapse to the SAME
    // [sum(c*bits), sum(c)] partial-aggregate order (bigramSurprisal
    // emits bits-first; perplexityBuckets' projection leads with
    // ppl_scaled), so their doc-keyed exchanges canonicalize identically
    // and AQE materializes the corpus scoring shuffle once. Exchange
    // reuse is a RUNTIME decision — assert it on the executed plan after
    // an action (r13 lesson). A source reorder that silently breaks the
    // canonical match would re-run the corpus scan per consumer; this
    // pin catches that as a missing doc-keyed ReusedExchange.
    val df = SparkEntry.queries("p90_perplexity_buckets")(spark, sf0001)
    try {
      df.queryExecution.toRdd.count()
      val ep = df.queryExecution.executedPlan.toString
      assert(ep.linesIterator.exists(l => l.contains("ReusedExchange") &&
        l.contains("hashpartitioning(doc_id")), ep.linesIterator.filter(
        _.contains("Exchange")).mkString("\n"))
    } finally graft.ops.CacheScope.releaseCurrent()
  }

  test("vocab coverage: no single-reducer window, total broadcasts") {
    // The prefix sum must run as the range-partitioned GlobalRank form:
    // every window in the plan partitions by __pid — a windowspec with no
    // __pid would be the global ORDER BY single-reducer shape the op
    // exists to avoid. The 1-row total reaches the filter as a broadcast
    // and nothing is cartesian. (The vocab aggregate subtree appears
    // under both the prefix-sum persist and the total branch; at
    // execution ReuseExchange materializes that shuffle once.)
    val p = plan("p81_vocab_coverage")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("__pid")),
      p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("approx-stats verdicts avoid the multi-distinct Expand blowup") {
    // p21 computes two exact distinct counts and the sketch verdicts as
    // SEPARATE 1-row aggregates cross-joined: folding them into one agg
    // makes Catalyst's multi-distinct rewrite Expand-replicate the scan
    // 4x and push the sketch buffers through it (5x slower measured).
    // The Expand node reappearing means someone re-fused the aggregates.
    val p = plan("p21_approx_stats")
    assert(!p.contains("Expand"), p.linesIterator.take(12).mkString("\n"))
    // The 1-row relations join as broadcasts; the corpus scan must never
    // be on the build side of anything.
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("exact-substring pairs: two winnow passes max, row-local pair expansion") {
    // Candidate pairs come from expanding the df-capped per-(hash, gram)
    // id array row-locally — NOT from a self-join of the anchor relation,
    // which would rebuild the winnowed corpus PER JOIN SIDE and broadcast
    // or shuffle it whole. The honest pass count is two (one to learn the
    // df cap — 16 B/row after map-side distinct — one to pair; the r17
    // shared-exchange single-pass form A/B-measured slower and wider);
    // this pins that it never regresses to the three of the self-join
    // form, and that no cartesian/window appears.
    val p = plan("p82_exact_substring_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    val winnowGenerates = p.linesIterator.count(l =>
      l.contains("Generate") && l.contains("winnow_anchors"))
    assert(winnowGenerates <= 2, s"winnow passes: $winnowGenerates\n$p")
    assert(p.contains("partial"), p)
  }

  /** Executed (post-action) FORMATTED plan — AQE exchange reuse is a
    * RUNTIME decision, so shared-subtree pins must read the final plan
    * after an action (the r13 lesson, same as the p90 pin below), and in
    * formatted mode, where a reused stage prints as ReusedExchange
    * instead of reprinting its subtree (toString would double-count).
    * Broadcasts are disabled for the run: at the fixture's toy sizes AQE
    * turns the shared-lineage joins into per-branch broadcast builds
    * (which cannot reuse a shuffle), while at bench/corpus scale they are
    * shuffle joins — the contract under test is the shuffle-regime
    * canonical equality, so the test pins that regime explicitly.
    */
  private def executedFinalPlan(name: String): String = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Capture-and-restore BOTH thresholds symmetrically (ADVICE r17: an
    // unconditional unset would silently drop a fixture-level adaptive
    // setting for later tests).
    val prevAdaptive =
      spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.queryExecution.toRdd.count()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAdaptive match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      graft.ops.CacheScope.releaseCurrent()
    }
  }

  /** Number of FINAL-plan operators whose detail block contains `marker`
    * (formatted explain lists the final tree first, `== Initial Plan ==`
    * second, then one detail block per operator id from both).
    */
  private def finalPlanMarkerCount(formatted: String, marker: String): Int = {
    val ids = "\\((\\d+)\\)".r
      .findAllMatchIn(formatted.split("== Initial Plan ==")(0))
      .map(_.group(1).toInt).toSet
    formatted.split("\n\n").count { block =>
      "^\\((\\d+)\\) ".r.findFirstMatchIn(block)
        .exists(m => ids.contains(m.group(1).toInt)) && block.contains(marker)
    }
  }

  test("r17 shared-lineage contracts: each expensive corpus pass runs once") {
    // r17 collapsed multi-branch recomputation of expensive row-local
    // lineages (winnow anchors, canon regex, token/chunk explodes) into
    // ONE exchange that every consumer reuses. The contract is held by
    // plan-canonicalization details (live aggregate pins, symmetric
    // isnotnull filters) that an innocent-looking edit can silently
    // break — in which case the marker expression reappears as a second
    // Generate/Project in the FINAL plan recomputing the same pass.
    // Each entry: query -> (marker substring, max lines allowed).
    val contracts = Seq(
      // NOTE the winnow family (p82/p85/p87) is deliberately ABSENT: its
      // second winnow pass shuffles fewer bytes than a shared exchange
      // would (A/B in the exactSubstringPairs rare-branch comment).
      // canon regex: the (canon, source) aggregate pass + the map-only
      // per-doc fold projection the two fold joins share (the coalesce in
      // leakageSafeSplit keeps the inferred isnotnull from adding a third
      // full-corpus copy as a pushed filter)
      ("p125_leakage_split", "regexp_replace", 2),
      // one shared pass: the symmetric isnotnull filter + the projection
      // are two expression sites of the SAME scan stage
      ("p109_canonical_dedup", "regexp_replace", 2),
      ("p03_dedup_ngram_jaccard", "ngram_shingles", 1),
      ("p60_tfidf_cosine", "explode(split(lower", 1),
      ("p83_source_drift", "explode(split(lower", 1),
      ("p45_passage_dedup", "posexplode(transform(sequence", 1),
      ("p86_chunk_keep_first", "posexplode(transform(sequence", 1),
      // single-source-scan contracts (the shared exchange serves every
      // consumer, so the table is read once per action)
      ("p03_dedup_ngram_jaccard", "Scan parquet", 1),
      ("p109_canonical_dedup", "Scan parquet", 1),
      ("p83_source_drift", "Scan parquet", 1),
      ("p45_passage_dedup", "Scan parquet", 1),
      ("p86_chunk_keep_first", "Scan parquet", 1))
    contracts.groupBy(_._1).foreach { case (q, cs) =>
      val ep = executedFinalPlan(q)
      cs.foreach { case (_, marker, maxN) =>
        val n = finalPlanMarkerCount(ep, marker)
        assert(n <= maxN, s"$q: '$marker' appears in $n final-plan operators " +
          s"(max $maxN)\n" +
          ep.linesIterator.filter(_.contains(marker)).mkString("\n"))
      }
      // Reuse must actually have fired — a shared lineage with no
      // ReusedExchange means the branches each built their own copy.
      assert(ep.split("== Initial Plan ==")(0).contains("ReusedExchange"),
        s"$q: no ReusedExchange\n" +
          ep.linesIterator.take(20).mkString("\n"))
    }
  }

  test("r17 surprisal tf/df: one token explode, df branch reuses the tf exchange") {
    val ep = executedFinalPlan("p75_surprisal_score")
    val generates = finalPlanMarkerCount(ep, "Generate")
    assert(generates <= 1, s"token explode ran $generates times\n$ep")
    assert(ep.split("== Initial Plan ==")(0).contains("ReusedExchange"), ep)
  }

  test("r17 integrity card: one overlay join, no per-count branch scans") {
    // Six integers out of ONE full-outer overlay of the per-id counts:
    // the anti-join/count branches (8 scans per action) must not return.
    val ep = executedFinalPlan("p108_integrity_card")
    assert(!ep.contains("LeftAnti"), ep)
    assert(ep.contains("FullOuter"), ep)
    val scans = finalPlanMarkerCount(ep, "Scan parquet")
    assert(scans <= 2, s"integrity card scans: $scans\n$ep")
  }

  test("substring spans: candidate-bounded text fetch, codegen'd extent, no cartesian") {
    // The pair relation expands row-locally (as in p82) and the two text
    // fetches are doc_id equi-joins — never a cartesian or a window —
    // and the extension is the codegen'd common_extent call, visible in
    // the plan rather than an interpreted lambda chain.
    val p = plan("p85_substring_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("common_extent"), p)
    assert(p.contains("partial"), p)
  }

  test("keep-first chunk dedup: MIN argmin aggregates, no window, no cartesian") {
    // The global first occurrence is a plain map-side-combinable MIN over
    // the (doc_id << 32 | cid) encoding — a ROW_NUMBER window over the
    // corpus-sized chunk relation would shuffle-sort every chunk instead.
    val p = plan("p86_chunk_keep_first")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
  }

  test("span excision: packed extent kernel, struct-MIN argmax, no window") {
    // Position and length come out of ONE common_extent_packed call per
    // row, and the per-document best span is a MIN over an ordering
    // struct — no second extent scan, no per-document window sort.
    val p = plan("p87_span_excision")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("common_extent_packed"), p)
    assert(p.contains("partial"), p)
  }

  test("dsir weights: bucket table broadcasts, stream never shuffles for the join") {
    // The 4096-row bucket table is the ONLY join input that moves: it
    // broadcasts, the corpus-sized bucket-count stream is joined
    // map-side, and the doc aggregate partial-combines. A shuffle join
    // here would move the corpus relation twice. The feature lineage is
    // the row-local bigram_bucket_counts kernel computed once per
    // consumer (A/B-measured cheaper than a shared aggregate exchange,
    // see TextOps.dsirWeights), so the plan must stay free of any
    // corpus-keyed exchange beyond the final doc aggregate's.
    val df = SparkEntry.queries("p88_dsir_weights")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
    assert(p.contains("partial"), p)
    assert(p.contains("bigram_bucket_counts"), p)
  }

  test("kmeans training: E-step is a broadcast + max_by aggregate, never a window") {
    // Every iteration's assignment must stay the ivfAssign shape: centroid
    // table broadcast, argmax as a hash aggregate (the 16-way fanout
    // collapses map-side). A ROW_NUMBER-per-vector window would
    // shuffle-sort cells x corpus rows each iteration.
    val df = SparkEntry.queries("p89_kmeans_train")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("max_by") || p.contains("partial"), p)
  }

  test("training M-steps: every per-vector collect_list is bucket-keyed (bounded state)") {
    // The k-means / PQ M-steps sum doubles in exact vec_id order, which
    // needs collect_list — but a collect_list keyed only by (cell, pos)
    // materializes a cell's full population in one group, the
    // executor-OOM shape at corpus scale. The two-level fold buckets by
    // vec_id >> shift first; this pins that: in every aggregate, any
    // collect_list whose element still references vec_id must carry the
    // bucket key (or a vec_id-derived shiftright) among its grouping
    // keys. Second-level collects (per-bucket sums, no vec_id) are
    // exempt by construction.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
    def unbucketed(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case a: Aggregate =>
          val collectsVec = a.aggregateExpressions.exists(_.exists {
            case ae: AggregateExpression =>
              ae.aggregateFunction.isInstanceOf[CollectList] &&
                ae.references.exists(_.name == "vec_id")
            case _ => false
          })
          val hasBucketKey = a.groupingExpressions.exists(g =>
            g.references.exists(_.name == "bkt") ||
              g.toString.toLowerCase.contains("shiftright"))
          if (collectsVec && !hasBucketKey) Seq(a.simpleString(3)) else Nil
      }.flatten
    val emb = Tables.t(spark, sf0001, "embeddings")
    // Detector self-check: the pre-r11 flat shape (collect over the full
    // cell population, no bucket key) must be flagged.
    locally {
      import org.apache.spark.sql.functions._
      val flat = emb
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("x")))).as("arr"))
      assert(unbucketed(flat).nonEmpty, "detector failed to flag the flat collect_list")
    }
    val asg = graft.ops.Similarity.kmeansStep(emb)
    assert(unbucketed(asg).isEmpty, unbucketed(asg).mkString("\n"))
    // pqAssign(trainIters = 1) embeds the trained codebook subtree, so
    // the trainer's M-step aggregates are inside this plan.
    val cb = graft.ops.ProductQuant.pqAssign(emb)
    assert(unbucketed(cb).isEmpty, unbucketed(cb).mkString("\n"))
    // kmeansTrain's per-iteration M-step is the same centroidMeans plan
    // kmeansStep audits above; its returned assignment plan has no
    // collect_list at all.
    val tr = SparkEntry.queries("p89_kmeans_train")(spark, sf0001)
    assert(unbucketed(tr).isEmpty, unbucketed(tr).mkString("\n"))
  }

  test("trajectories: one user-keyed aggregate with cap-bounded state, no collect_list") {
    // n_events/first/last are plain count/min/max and the fingerprint
    // prefix is the FirstKBySeq bounded accumulator — the full-sequence
    // collect_list (hot-user OOM) must not reappear, nor a window.
    val df = SparkEntry.queries("p104_trajectories")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.linesIterator.take(10).mkString("\n"))
    assert(!p.toLowerCase.contains("collect_list"), p)
    assert(p.contains("firstkbyseq") || p.contains("FirstKBySeq"), p)
    assert(p.contains("partial"), p)
  }

  test("bm25 top-k: literal-folded scoring joins NOTHING; only top-k partials exchange") {
    // r12 folded path: per-term document frequencies and corpus stats are
    // collected once (term-bounded) and folded into the score expression
    // as literals, so the scoring pass has NO join of any kind and no
    // per-(query, doc) exchange — the only shuffle is the bounded-heap
    // TopKByScore partials. A join or window reappearing means the
    // postings LUT stopped being folded.
    val df = SparkEntry.queries("p97_bm25_topk")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("Join"), p)
    assert(p.contains("TopKByScore") || p.contains("topkbyscore") || p.contains("partial"), p)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected only the top-k partial exchange, got $exchanges:\n$p")
  }

  test("domain rank: the corpus-touching stage is one partial hash aggregate") {
    // The collected relation is domains^2-bounded BY CONSTRUCTION; the
    // plan that feeds it must be a map-side-combined aggregate over the
    // exploded link relation — no join, no window, no cartesian touches
    // the corpus.
    val edges = graft.ops.DomainRank.syntheticEdges(
      graft.Tables.t(spark, sf0001, "documents"), 64, 3)
      .groupBy("src", "tgt").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val p = edges.queryExecution.executedPlan.toString
    assert(p.contains("partial"), p.linesIterator.take(10).mkString("\n"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"), p)
  }

  test("overlap sketch ranks via TakeOrdered heads, never a global sort") {
    val sh = graft.ops.Dedup.shingles(graft.Tables.t(spark, sf0001, "documents"), 3)
    val side = sh.select(graft.ops.Sampling.h56(
      org.apache.spark.sql.functions.col("shingle")).as("h")).distinct()
      .orderBy(org.apache.spark.sql.functions.col("h")).limit(256)
    val p = side.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(6).mkString("\n"))
  }

  test("curriculum interleave windows only the partition-offset relation") {
    // Both ranks are GlobalRank's range-partition + offset construction.
    // The ONLY Window nodes allowed are the running sums over the
    // #partitions-row __pid offset tables; a window keyed on source (or
    // unkeyed) would mean a per-source/single-reducer sort snuck back in.
    val df = SparkEntry.queries("p106_curriculum")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, "expected the offset windows to exist")
    windows.foreach(w => assert(w.contains("__pid"), w))
  }

  test("blocklist screen and exact-N sample stay shuffle-free / TakeOrdered") {
    // The safety screen is a row-local projection: any Exchange means a
    // shuffle snuck into a map-only contract.
    val screen = SparkEntry.queries("p111_blocklist_screen")(spark, sf0001)
    val ps = screen.queryExecution.executedPlan.toString
    assert(!ps.contains("Exchange"), ps.linesIterator.take(8).mkString("\n"))
    // Exactly-N compiles to TakeOrderedAndProject, not a global sort.
    val sample = SparkEntry.queries("p110_exact_n_sample")(spark, sf0001)
    val pn = sample.queryExecution.executedPlan.toString
    assert(pn.contains("TakeOrderedAndProject"), pn.linesIterator.take(6).mkString("\n"))
  }

  test("AQE splits a skewed sort-merge join at runtime (the unsalted skew path)") {
    // Salting (p28/p42) is the explicit skew answer; this pins the
    // IMPLICIT one — adaptive execution must recognize a hot key and
    // split its partition, because at 100 TB not every skewed join will
    // have been salted by hand. Thresholds are lowered so the toy
    // fixture trips the same code path a production hot key would.
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> util.Try(s.conf.getOption(k)).toOption.flatten.filter(_ != null)
    }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // 50k rows on ONE key vs a uniform side: partition for key 0 dwarfs
      // the median partition.
      val hot = s.range(0, 50000)
        .select(lit(0L).as("k"), lpad(col("id").cast("string"), 64, "x").as("pad"))
        .union(s.range(1, 64)
          .select(col("id").as("k"), lpad(col("id").cast("string"), 64, "x").as("pad")))
      val dim = s.range(0, 64).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = hot.join(dim, "k").agg(sum(length(col("pad"))), sum("v"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("r12 additions: dup-ngram card is the p80 stream shape without the LM join") {
    // Row-local pair_counts kernel, Generate, partial aggregation; no
    // join, no window, no cartesian anywhere — the whole query is one
    // doc-keyed partial-combined exchange.
    val p = plan("p115_dup_ngram_card")
    assert(p.contains("Generate") && p.contains("pair_counts"), p.linesIterator.take(8).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("r12 additions: filtered ANN pushes the label filter to the scan, probes without a window") {
    // The label predicate must reach the parquet reader (PushedFilters),
    // the codebook/query sides broadcast, and ranking is the bounded
    // heap — a window or cartesian means the IVF shape rotted.
    val p = plan("p116_filtered_ann")
    assert(p.contains("PushedFilters: [In(label") || p.contains("PushedFilters: [IsNotNull(label"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("r12 additions: video decode is map-only — zero exchanges") {
    // flatMap over the typed binary column: per-partition decode, one
    // row per sampled frame, nothing shuffles at any corpus size.
    val df = SparkEntry.queries("p117_video_decode")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.linesIterator.take(10).mkString("\n"))
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("r15: domain reweight is one plan — windows only over the #sources relation") {
    // r15 collapsed the r12 persist + two broadcast cross-joins (21 Spark
    // jobs for sub-second exec — the r14 verdict's job-cascade item) into
    // unpartitioned window aggregates over the #sources-bounded relation:
    // single consumer chain, so no persist (no InMemoryRelation), no
    // cross join, and the only windows sit ABOVE the per-source aggregate
    // (safe exactly because that relation's cardinality is #sources).
    val p = plan("p119_domain_reweight")
    assert(!p.contains("InMemoryRelation"), p.linesIterator.take(10).mkString("\n"))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // The corpus-sized aggregates keep their map-side partials.
    assert(p.contains("partial"), p)
  }

  // Exchange reuse is an AQE-time decision: execute, then read the
  // finalized plan.
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("r13 sketches: CMS tokenizes the corpus ONCE (reused exchange), grid broadcasts") {
    val p = finalPlan("p121_cms_heavy_hitters")
    // Both card halves (grid cells + exact top-k) consume the same
    // token-count aggregate: its exchange must be built once and REUSED,
    // not recomputed per branch.
    assert(p.contains("ReusedExchange"), p.linesIterator.take(12).mkString("\n"))
    // The 4096-cell grid joins the 80 top-k probes via broadcast; the
    // top-k itself is TakeOrdered, never a global sort; aggregation is
    // partial (map-side combined) everywhere.
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial"), p)
    assert(!p.contains("Window"), p)
  }

  test("r13 sketches: HLL derives everything from one reused distinct-pair scan") {
    val p = finalPlan("p122_hll_card")
    // Registers, per-source exacts and the '*ALL*' row all read the
    // distinct (source, h) aggregate — one corpus scan, reused.
    assert(p.contains("ReusedExchange"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("r13 sketches: CDC chunking is codegen'd map-work into one chunk-keyed aggregate") {
    val df = SparkEntry.queries("p123_cdc_chunks")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // The kernel runs inside the scan-side codegen stage (Generate over
    // cdc_chunks), and the only exchanges are the chunk-hash hash
    // aggregate and the final 1-row reduce — no window, no sort, no
    // corpus-sized join.
    assert(p.contains("cdc_chunks"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"), p)
    df.queryExecution.toRdd.count()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("codegen id"), formatted.linesIterator.take(10).mkString("\n"))
  }

  test("r14 mjpeg decode: one id-spread exchange, then map-only decode") {
    // Same contract as the y4m pin — per-partition container walk +
    // entropy decode over the typed binary column, one row per frame —
    // plus the demo source's ONE RoundRobin exchange of bare ids (the
    // fixture parquet is single row-group = one split; real media
    // arrives pre-split). Nothing else shuffles at any corpus size, and
    // the exchange carries longs, never payloads.
    val df = SparkEntry.queries("p126_mjpeg_decode")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("RoundRobinPartitioning"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("r14 all-but-the-top: the mean fold is distributed — only dims rows reach the driver") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val dims = 8
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), shiftright(col("vec_id"), 2).as("bkt"),
        expr(s"transform(slice(embedding, 1, $dims), x -> CAST(x AS DOUBLE))").as("vd"))
    val mean = graft.ops.Similarity.meanFoldDF(vecs, dims)
    // The r13 form collected one row per vec_id-bucket (N/2^shift rows of
    // dims doubles) and folded on the driver; the r14 contract is that
    // the level-2 bucket fold runs as a pos-keyed aggregate and the
    // relation the driver collects is exactly dims rows.
    assert(mean.count() == dims)
    val p = mean.queryExecution.executedPlan.toString
    // Two hash-aggregate levels around the position explode, partial
    // (map-side combined), no window, no single-reducer sort.
    assert(p.contains("Generate"), p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert(!p.contains("Window"), p)
  }

  test("r14 tuning card: one full-outer overlay, one multi-aggregate pass — no re-execution") {
    val p = plan("p94_lsh_tuning_card")
    // The r13 form computed the four counts as four separate 1-row
    // aggregates cross-joined together, re-traversing the shared
    // candidate lineage per count (the corpus's worst load-amplification
    // case). The r14 form overlays the two pair relations with ONE full
    // outer join and reads all four counts from one aggregate: no
    // nested-loop cross join anywhere, exactly one FullOuter join, and
    // the final aggregate is partial (map-side combined). r15 adds the
    // isolation persists: both (i, j) sides are materialized before the
    // overlay, so the join consumes two InMemoryRelations and the heavy
    // candidate lineages never co-schedule (the in-corpus amplification
    // BENCH_r14 flagged).
    assert(!p.contains("NestedLoopJoin"), p.linesIterator.take(12).mkString("\n"))
    assert("FullOuter".r.findAllIn(p).size == 1, p.linesIterator.take(12).mkString("\n"))
    assert(p.contains("partial"), p)
    assert("InMemoryRelation".r.findAllIn(p).size >= 2,
      p.linesIterator.take(12).mkString("\n"))
  }
}
