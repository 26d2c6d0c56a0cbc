package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** Fixture dir resolution (VERDICT r16 #3): argv(0) wins, the env is
    * the fallback — `runMain graft.Bench /tmp/sf100x` used to silently
    * bench the env/default dir (graft.Verify takes positional args, so
    * the asymmetry cost a measurement run). More than one argument is
    * an error, not a guess.
    */
  private[graft] def resolveSfDir(args: Array[String],
      env: Map[String, String]): Either[String, String] =
    if (args.length > 1)
      Left(s"unexpected arguments: ${args.drop(1).mkString(" ")} " +
        "(usage: graft.Bench [sfDir])")
    else
      Right(args.headOption.getOrElse(
        env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")))

  /** (total jiffies, steal jiffies) from /proc/stat — the hypervisor
    * steal counter. This box (r17 finding) is throttled in BURSTS at the
    * hypervisor level (cumulative steal exceeded cumulative user time in
    * one session): a burst landing inside a timed run inflates it up to
    * 25x with nothing in loadavg to show for it. Stamping the run's
    * steal fraction makes a throttled artifact self-identifying, exactly
    * like the loadavg stamp (round 7's lesson, same class).
    */
  private def cpuTicks(): (Long, Long) =
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      // Sum only user..steal (first 8 fields): guest/guest_nice are
      // already folded into user/nice by the kernel, so adding them
      // would inflate the denominator and understate steal (ADVICE r17).
      (f.take(8).sum, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (0L, 0L) }

  /** Steal percentage between two [[cpuTicks]] snapshots; -1 when either
    * snapshot failed (tick0 == 0 would otherwise silently turn the stamp
    * into cumulative-since-boot — ADVICE r17).
    */
  private[graft] def stealBetween(t0: (Long, Long), t1: (Long, Long)): Double =
    if (t0._1 > 0 && t1._1 > t0._1)
      100.0 * (t1._2 - t0._2) / (t1._1 - t0._1)
    else -1.0

  def main(args: Array[String]): Unit = {
    val sfDir = resolveSfDir(args, sys.env) match {
      case Right(d) => d
      case Left(msg) => System.err.println(s"graft.Bench: $msg"); sys.exit(2); return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // Dev knobs (default = the shipped config): SPARK_GRAFT_SHUFFLE
      // overrides the shuffle partition count, SPARK_GRAFT_AQE=false
      // disables adaptive execution — for isolating stage-scheduling
      // floors on small fixtures.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config("spark.ui.enabled", "false")
    // Dev knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers arbitrary confs
    // on top — the A/B harness for floor experiments (AQE coalesce
    // policy, compression, advisory sizes) without a recompile.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JIT/codegen paths, parquet footers,
    // and one of each heavy executor machinery path (shuffle join, window,
    // hash aggregate, higher-order lambdas, regex, md5) over a synthetic
    // range — so measured queries pay their own data-processing cost, not
    // the JVM's one-time class-load/JIT of Spark internals. No testdata
    // table is touched beyond footer/count, keeping the timed scans cold.
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    spark.range(1000000).selectExpr("sum(id)").collect()
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val a = spark.range(100000).select(
        col("id"), (col("id") % 97).as("k"),
        concat_ws(" ", lit("w"), col("id").cast("string"), lit("x y z")).as("text"))
      val b = spark.range(1000).select((col("id") % 97).as("k"), col("id").as("v"))
      a.join(b, "k")
        .withColumn("toks", split(lower(col("text")), " "))
        .withColumn("nhit", size(filter(col("toks"), w => w.isin("w", "x"))))
        .withColumn("sh", expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))"))
        .withColumn("h", conv(substring(md5(col("text")), 1, 14), 16, 10))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("id"))))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), collect_set(col("nhit")).as("s"))
        .queryExecution.toRdd.count()
      // Second warmup wave: the executor machinery the first wave misses
      // but the corpus leans on — higher-order lambda evaluation
      // (aggregate/zip_with), object/sketch aggregates (approx_percentile,
      // HLL, collect_list+sort_array), min_by/max_by, countDistinct's
      // distinct rewrite, broadcast joins on BOTH code paths (hash +
      // nested-loop), posexplode, translate/regexp_replace, and graft's
      // own codegen'd expressions (their generated classes compile on
      // first use). Still synthetic ranges only — no testdata is touched,
      // so the timed scans stay cold.
      graft.functions.GraftFunctions.register(spark)
      val v = spark.range(2000).select(
        col("id"), (col("id") % 7).as("g"),
        concat_ws(" ", lit("alpha beta"), col("id").cast("string")).as("s"),
        expr("transform(sequence(0, 15), i -> cast(id % (i + 2) as double))").as("vec"),
        expr("transform(sequence(0, 7), i -> struct(concat('t', i % 5) as t, id % 9 as w))").as("ents"))
      val tiny = spark.range(8).select(col("id").as("q"),
        expr("transform(sequence(0, 15), i -> cast(id + i as double))").as("qv"))
      v.join(broadcast(tiny), expr("id % 11 = q"), "left")
        .withColumn("dot", expr("aggregate(zip_with(vec, qv, (x, y) -> x * y), 0D, (a, b) -> a + b)"))
        .withColumn("rh", expr("rolling_hash(s)"))
        .withColumn("vd", expr("vec_dot(vec, vec)"))
        .withColumn("wh", expr("winnow_hashes(s, 4, 2)"))
        .withColumn("tr", length(translate(regexp_replace(col("s"), "[0-9]+", "#"), "#", "")))
        .select(col("g"), col("dot"), col("rh"), col("vd"), col("tr"),
          posexplode(col("ents")).as(Seq("p", "e")))
        .groupBy(col("g"))
        .agg(
          countDistinct(col("e.t")).as("cd"),
          approx_count_distinct(col("rh")).as("acd"),
          min_by(col("p"), struct(col("dot"), col("p"))).as("mb"),
          expr("approx_percentile(dot, array(0.5, 0.9))").as("ap"),
          expr("percentile(tr, 0.5)").as("pc"),
          sort_array(collect_list(struct(col("p"), col("dot")))).as("arr"))
        .withColumn("agg2", expr("aggregate(transform(arr, x -> x.dot), 0D, (a, b) -> a + b)"))
        .queryExecution.toRdd.count()
      // Third wave: machinery the round-9 additions lean on that the first
      // two waves miss — the stacked map-explode + countDistinct profile
      // shape, widened-decimal arithmetic, date_trunc keyed aggregation,
      // bin()/bit-length sums, struct-max argmax, and the anti-join path.
      // Synthetic ranges only, as above.
      import org.apache.spark.sql.functions.{broadcast => _, _}
      val w3 = spark.range(50000).select(
        col("id"), (col("id") % 5).cast("string").as("g"),
        (col("id") % 1000).as("k"),
        timestamp_micros(col("id") * 1000000L).as("ts"))
      w3.select(explode(map(
          lit("a"), col("id").cast("string"), lit("b"), col("g")))
          .as(Seq("cn", "v")))
        .groupBy(col("cn"))
        .agg(count(lit(1)).as("nr"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("nn"),
          countDistinct(col("v")).as("nd"))
        .queryExecution.toRdd.count()
      val dec = "decimal(38,0)"
      val daily = w3.groupBy(col("g"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val nDec = col("n").cast(dec)
      val stats = daily.groupBy(col("g")).agg(
        count(lit(1)).as("ndy"), sum(nDec).as("s"), sum(nDec * nDec).as("ss"))
      daily.join(stats, "g")
        .select(((col("ndy").cast(dec) * col("n").cast(dec)) -
          col("s").cast(dec)).as("d2"))
        .select((col("d2") * col("d2") >= lit(4).cast(dec)).as("f"))
        .queryExecution.toRdd.count()
      w3.groupBy(col("k")).agg(
          max_by(col("g"), struct(col("id"), col("g"))).as("mb"),
          max(struct(col("id"), col("g"))).getField("id").as("mx"),
          sum(length(bin(col("id") + 1)) - 1).as("sb"))
        .queryExecution.toRdd.count()
      w3.select(col("id"))
        .join(w3.filter(col("id") % 3 === 0).select(col("id")), Seq("id"), "left_anti")
        .queryExecution.toRdd.count()
    }
    // SPARK_GRAFT_SERVE=1: warmed-gateway serving posture — pin the base
    // tables as in-memory relations (outside the timed region) the way a
    // production serving tier caches its hot tables; see
    // Tables.pinForServing. Recorded in the artifact ("serve":true);
    // pair it against DuckDB's symmetric warm form
    // (tools/bench_duckdb.py --materialize).
    val serve = sys.env.get("SPARK_GRAFT_SERVE").contains("1")
    if (serve) Tables.pinForServing(spark, sfDir)
    // Dev loop: SPARK_GRAFT_BENCH_ONLY=p03,p12 times just those queries
    // (prefix match); unset = the full corpus, as the driver runs it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val base = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // Dev hook: SPARK_GRAFT_BENCH_BREAK=1 injects a query that always
    // throws, to exercise the fail-honest path below (the broken query
    // must show up flagged and be excluded from the totals).
    val selected =
      if (sys.env.contains("SPARK_GRAFT_BENCH_BREAK"))
        base + ("zz_dev_broken" -> ((s: SparkSession, _: String) =>
          s.range(1).selectExpr("assert_true(id > 0, 'deliberately broken')", "id")))
      else base
    // SPARK_GRAFT_BENCH_REPEAT=N times each query N times. Every run is
    // timed: run 1 is the COLD time (fresh plan + codegen/JIT), run N the
    // STEADY time — both totals land in the artifact, because the 2x gate
    // is judged on steady-state while cold carries the round-over-round
    // trend. Default 2 so the official driver artifact records the pair
    // in one invocation; set 1 for the quickest dev loop.
    val repeat = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(2))
    // SPARK_GRAFT_CONC=N: serving-throughput mode — N worker threads
    // drain the corpus concurrently (the gateway's actual posture: the
    // HTTP API serves overlapping requests on one shared context, each
    // on its own thread; Spark's FIFO scheduler interleaves their jobs).
    // Sequential per-query latency leaves most of a 32-core box idle on
    // sub-second queries — the stage-barrier floor the judge measured is
    // scheduling, not compute, and overlapping queries absorbs it. Wall
    // clock per sweep is the honest metric here (per-query numbers under
    // contention are not attributable); pair it against
    // tools/bench_duckdb.py --jobs N, the same posture for the oracle.
    val conc = math.max(1,
      sys.env.get("SPARK_GRAFT_CONC").map(_.toInt).getOrElse(1))
    if (conc > 1) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
      // Steal stamp covers ONLY the timed sweeps (ADVICE r17: a window
      // spanning session build + warmup dilutes a burst confined to one
      // sweep toward a small whole-run percentage).
      val tick0 = cpuTicks()
      val sweeps = (1 to repeat).map { sweep =>
        val t0 = System.nanoTime()
        val futs = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] =
              try {
                fn(spark, sfDir).queryExecution.toRdd.count()
                graft.ops.CacheScope.releaseCurrent()
                None
              } catch {
                case e: Throwable =>
                  graft.ops.CacheScope.releaseCurrent()
                  Some(name + ": " + e.getClass.getSimpleName)
              }
          })
        }
        val errs = futs.flatMap(f => Option(f.get()).flatten)
        val dt = (System.nanoTime() - t0) / 1e9
        if (!serve) spark.catalog.clearCache()
        System.gc()
        System.err.println(s"[bench] conc sweep $sweep: $dt errors=${errs.size}")
        (dt, errs)
      }
      pool.shutdown()
      val loadNow =
        try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+").take(3)
          .mkString("[", ",", "]")
        catch { case _: Throwable => "[-1]" }
      // Name the failures, not just count them — an artifact with
      // errors must be diagnosable from the record alone (the
      // sequential mode's per-query {"err": ...} contract).
      val errNames = sweeps.flatMap(_._2).distinct.take(20)
        .map(s => "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120) + "\"")
        .mkString("[", ",", "]")
      val stealPct = stealBetween(tick0, cpuTicks())
      val json =
        s"""{"metric":"total","value":${sweeps.head._1},"unit":"sec","mode":"throughput",""" +
          s""""conc":$conc,"serve":$serve,"sweeps":${sweeps.map(_._1).mkString("[", ",", "]")},""" +
          s""""cold":${sweeps.head._1},"steady":${sweeps.last._1},""" +
          s""""errors":${sweeps.map(_._2.size).sum},"failed":$errNames,"loadavg":$loadNow,""" +
          s""""steal_pct":${math.round(stealPct * 100) / 100.0},""" +
          s""""queries":${selected.size},"sf":"$sfDir"}"""
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
      if (serve) Tables.unpinServing(spark, sfDir)
      spark.stop()
      println(json)
      return
    }
    // Steal stamp covers ONLY the timed query loop (ADVICE r17), not
    // session build/warmup — the inter-query cache drains inside the loop
    // are microseconds against any timed run.
    val tick0 = cpuTicks()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to repeat).map { i =>
        val t0 = System.nanoTime()
        // Execute the already-compiled physical plan end to end. A DataFrame
        // .count() would let Catalyst prune the projections away; toRdd keeps
        // every output column materialized, matching the DuckDB fetchall
        // comparison in tools/bench_duckdb.py without driver serialization.
        // A query that throws must NOT be timed as ~0 s and silently shrink
        // the totals (a broken corpus would then LOWER the headline number):
        // record the error, flag it in the artifact, and exclude the query
        // from the cold/steady sums below.
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch {
          case e: Throwable =>
            val msg = (e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")).take(160)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ")
            err = Some(msg)
            System.err.println(s"[bench] $name FAILED run $i: $msg")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Clear persisted blocks OUTSIDE the timed region after EVERY run
        // (not just between repeats): operators that persist for
        // correctness (GlobalRank's pinned range partitioning in
        // q22/p30/p57/p81) never unpersist — their blocks otherwise
        // accumulate across the corpus run and later queries pay
        // eviction/GC for data they never read (p58 measured 4.0–4.5 s
        // mid-corpus vs 0.7 s standalone). Each query is measured from
        // the same clean block-manager state its standalone measurement
        // has; repeats also re-materialize persists, as before.
        // Drain the CacheScope registry first: it unpersists every
        // operator-tracked persist and would otherwise retain the plan
        // trees for the whole corpus run (170 queries × repeats on one
        // thread).
        graft.ops.CacheScope.releaseCurrent()
        // clearCache() additionally drops any UNtracked cached relation
        // — but it would also evict the serving pins, so serve mode
        // relies on the tracked drain alone (the pins are the only
        // intended survivors).
        if (!serve) spark.catalog.clearCache()
        // Dev probe: SPARK_GRAFT_BENCH_GC=1 additionally forces a GC
        // outside the timed region, letting ContextCleaner reap the
        // broadcast blocks earlier queries leaked into storage memory —
        // isolates heap-accumulation effects from plan costs when a
        // query measures slower mid-corpus than standalone.
        if (sys.env.contains("SPARK_GRAFT_BENCH_GC")) System.gc()
        if (i < repeat) System.err.println(s"[bench] $name run $i: $dt")
        dt
      }
      (name, times, err)
    }
    val tick1 = cpuTicks()
    val (failed, ok) = results.partition(_._3.isDefined)
    // Per-query detail reports the LAST (steady) run; with repeat=1 the
    // single cold run is both. Failed queries carry an {"err": ...} object
    // instead of a number so the artifact is self-honest.
    val qs = results.map {
      case (k, _, Some(msg)) => s"\"" + k + "\":{\"err\":\"" + msg + "\"}"
      case (k, v, None) => s"\"" + k + "\":" + v.last
    }.mkString("{", ",", "}")
    val cold = ok.map(_._2.head).sum
    val steady = ok.map(_._2.last).sum
    // "value" stays the cold total: that is what rounds 1-8's artifacts
    // recorded, so the trend line remains comparable.
    val total = cold
    // Stamp the run's environment into the artifact so a load-inflated
    // record is self-identifying (round 7's official bench ran on a busy
    // machine and read 1.7x slower than an idle re-run of the same code):
    // 1/5/15-min load averages at completion, the machine's core count,
    // the worker count used, and the repeat mode.
    val loadAvg =
      try {
        val parts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg")),
          java.nio.charset.StandardCharsets.UTF_8).split("\\s+")
        parts.take(3).mkString("[", ",", "]")
      } catch {
        case _: Throwable =>
          s"[${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}]"
      }
    // workers is quoted: SPARK_GRAFT_CPUS may legitimately be "*".
    val stealPct = stealBetween(tick0, tick1)
    val env = s""""loadavg":$loadAvg,"cores":${Runtime.getRuntime.availableProcessors},""" +
      s""""workers":"$cpus","repeat":$repeat,"errors":${failed.size},""" +
      s""""steal_pct":${math.round(stealPct * 100) / 100.0},""" +
      s""""serve":$serve,"cold":$cold,"steady":$steady"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$env}"""
    // The driver parses this from the log tail; sbt prefixes and truncation
    // made round-1's line unrecoverable. Persist to a file AND print it as the
    // final line after spark.stop() so no shutdown logging follows it.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // Serving pins are registry-held (Tables.pinned) — drop them so a
    // long-lived embedder of this main doesn't retain the relations
    // past the run (spark.stop() below covers this process, not that
    // caller).
    if (serve) Tables.unpinServing(spark, sfDir)
    spark.stop()
    println(json)
    // The driver recovers the result from a bounded log tail; the full
    // per-query dict above overflows it. Emit a compact summary as the very
    // last line: totals plus the slowest queries, full detail in `outPath`.
    // The driver's round-over-round PERF comparison reads per-query data
    // from THIS line only, so a name that slips out of the slowest-5
    // window reads as "dropped_from_bench" (r17: p43/p68 flagged when
    // p94's steal-inflated run shifted the window). Pin every name a
    // prior round's artifact published so the printed set only grows —
    // the queries-never-removed contract applied to the compact line.
    val pinnedNames = Seq(
      "p94_lsh_tuning_card", "p118_cluster_histogram", "p44_pq_adc_topk",
      "p43_pq_assign", "p68_cluster_best_keep", // BENCH_r16 line
      "p55_editdist_pairs", "p06_simhash_pairs") // BENCH_r17 line
    val byName = ok.map { case (k, v, _) => k -> v.last }.toMap
    val topNames = (ok.sortBy(-_._2.last).take(5).map(_._1) ++
      pinnedNames.filter(byName.contains)).distinct
    val top = topNames
      .map(k => s"\"" + k + "\":" + (math.round(byName(k) * 100) / 100.0))
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","queries":$top,"sf":"$sfDir",$env,"detail":"$outPath"}""")
  }
}
