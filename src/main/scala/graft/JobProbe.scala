package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-query Spark JOB and STAGE counts plus wall time — the
  * listener methodology behind BASELINE.md's job-cascade analysis (r14:
  * p90 ran 31 jobs for 1.3 s of exec; r15 targets halving that). Not part
  * of any gate; run it when a query's wall is dominated by scheduling
  * floor rather than exec and you need to know which.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.JobProbe p90_perplexity_buckets p119_domain_reweight"
  *
  * Each query runs twice (cold, steady); counts and walls are printed for
  * BOTH so JIT/footer effects are visible. Construction happens inside
  * the counted region — a query whose construction launches jobs (an
  * eager probe or materialization) shows them here.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    // SPARK_GRAFT_PROBE_VERBOSE=1 prints one line per job (its first
    // stage's name + task count) — the "which 28 jobs?" view.
    val verbose = sys.env.contains("SPARK_GRAFT_PROBE_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val s = j.stageInfos.lastOption
          println(s"[jobprobe]   job ${j.jobId}: stages=${j.stageInfos.size} " +
            s"${s.map(x => x.name + " tasks=" + x.numTasks).getOrElse("")}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // The bus is async: drain by polling until counts stop moving.
    def settle(): (Int, Int) = {
      var prev = (-1, -1)
      var cur = (jobs.get(), stages.get())
      while (cur != prev) { Thread.sleep(150); prev = cur; cur = (jobs.get(), stages.get()) }
      cur
    }
    for (name <- args; run <- Seq("cold", "steady")) {
      val (j0, s0) = settle()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.releaseCurrent()
      val (j1, s1) = settle()
      println(f"[jobprobe] $name $run: jobs=${j1 - j0} stages=${s1 - s0} wall=$wall%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
