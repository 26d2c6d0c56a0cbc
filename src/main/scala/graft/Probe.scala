package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Per-query measurement probe (optimization guide §1): for every corpus
  * query, the wall time of the SAME timed action the bench uses, plus the
  * scheduler-level shape the wall time decomposes into — jobs, stages,
  * tasks, shuffle bytes, input bytes — and the executed plan's formatted
  * explain. Dev tooling only: the driver contract lives in [[Bench]];
  * this main exists so optimization rounds can tell scheduling floor
  * (many tiny stages) from real compute before touching an operator, and
  * so plan claims in OPTIMIZATION_r*.md are checkable files, not prose.
  *
  * Usage: runMain graft.Probe <sfDir> <outDir> [queryPrefix,...]
  * Writes <outDir>/probe.json (one line per query) and
  * <outDir>/<query>.txt (explain FORMATTED after execution, so AQE's
  * final plan — ReusedExchange, coalesced reads — is what's on file).
  */
object Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/probe"
    val only = if (args.length > 2)
      Some(args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    else None
    Files.createDirectories(Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Same warmup as Bench: footers + machinery, no timed-table data.
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.functions.GraftFunctions.register(spark)

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    val inBytes = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    def settle(): Unit = {
      // Listener bus is async; wait for the job counter to stop moving.
      var prev = -1
      var cur = jobs.get()
      while (cur != prev) { Thread.sleep(50); prev = cur; cur = jobs.get() }
    }

    val selected = only match {
      case Some(ps) =>
        SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    val out = new StringBuilder
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      // Run 1 (cold): plan + codegen + execute; timed like the bench.
      val t0 = System.nanoTime()
      val df1 = fn(spark, sfDir)
      try df1.queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[probe] $name FAILED: $e") }
      val cold = (System.nanoTime() - t0) / 1e9
      graft.ops.CacheScope.releaseCurrent()
      spark.catalog.clearCache()
      settle()
      // Run 2 (steady): counters snapshot around it.
      val (j0, s0, k0, w0, r0, i0) =
        (jobs.get, stages.get, tasks.get, shufW.get, shufR.get, inBytes.get)
      val t1 = System.nanoTime()
      val df2 = fn(spark, sfDir)
      try df2.queryExecution.toRdd.count()
      catch { case _: Throwable => () }
      val steady = (System.nanoTime() - t1) / 1e9
      graft.ops.CacheScope.releaseCurrent()
      settle()
      val line =
        s"""{"q":"$name","cold":${f"$cold%.3f"},"steady":${f"$steady%.3f"},""" +
          s""""jobs":${jobs.get - j0},"stages":${stages.get - s0},"tasks":${tasks.get - k0},""" +
          s""""shufW":${shufW.get - w0},"shufR":${shufR.get - r0},"input":${inBytes.get - i0}}"""
      out.append(line).append('\n')
      System.err.println(s"[probe] $line")
      // Executed (post-AQE) formatted plan of the steady run.
      try {
        val txt = df2.queryExecution.explainString(FormattedMode)
        Files.write(Paths.get(outDir, s"$name.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
      } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.setJobDescription(null)
    }
    Files.write(Paths.get(outDir, "probe.json"),
      out.toString.getBytes(StandardCharsets.UTF_8))
    spark.stop()
    println(s"probe: wrote ${selected.size} queries to $outDir")
  }
}
