package graft.gateway

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.sources.{IcebergLite, IcebergLiteWriter, TableInfo}

/** Per-request query execution (the reference's `run_query` +
  * `_duckdb_connection`, /root/reference/backend/main.py:361-388,567-620).
  *
  * Session model (A7): one long-lived SparkSession per process (JVM/Spark
  * startup is the analog of the reference's extension warmup) and
  * `spark.newSession()` per request — isolated SQLConf and temp-view
  * namespace so concurrent requests cannot see each other's bound
  * `iceberg_scan` views. Credential isolation on the shared Hadoop conf is
  * the known hard part (SURVEY.md §7.3); storage settings are produced as
  * per-request maps (ConnectionConfig.s3aSettings) and would be applied as
  * per-bucket/per-catalog overrides on a real deployment.
  */
object Engine {

  final case class QueryStats(executionTimeMs: Long, bytesScanned: Long, rowsReturned: Long)
  final case class QueryResult(
      columns: Seq[String], rows: Seq[Seq[Any]], stats: QueryStats, truncated: Boolean)
  final case class EngineError(status: Int, detail: String) extends RuntimeException(detail)

  val DefaultRowLimit = 1000
  val MaxRowLimit = 10000

  def executeQuery(
      root: SparkSession,
      sql: String,
      config: ConnectionConfig,
      rowLimit: Int = DefaultRowLimit): QueryResult = {
    if (rowLimit > MaxRowLimit)
      throw EngineError(400, s"rowLimit must be <= $MaxRowLimit")
    // Bounded-cache contract for the long-running gateway: any
    // intermediate an operator persists during this request (tracked via
    // CacheScope) is released once the rows are collected — per-request
    // newSession() isolates conf/catalog but NOT the block manager, so
    // without this, persisted blocks would accumulate across requests
    // for the lifetime of the shared SparkContext.
    try executeQueryInner(root, sql, config, rowLimit)
    finally graft.ops.CacheScope.releaseCurrent()
  }

  private def executeQueryInner(
      root: SparkSession,
      sql: String,
      config: ConnectionConfig,
      rowLimit: Int): QueryResult = {
    val t0 = System.nanoTime()
    val cfg = Try(ConnectionConfig.validated(config)) match {
      case Success(c) => c
      case Failure(e) => throw EngineError(400, e.getMessage)
    }
    val spark = root.newSession()
    // Graft's custom expressions (vec_dot, winnow_hashes, ...) plus the
    // DuckDB-compat type-dispatchers (len, duck_slice) resolve per
    // session; registering here means the gateway works on ANY root
    // session, not only one built with GraftExtensions.
    graft.functions.GraftFunctions.register(spark)
    applyStorageSettings(spark, cfg)

    // Delete-guard on the configured direct table path before every query
    // (reference main.py:575-576). Probe failures degrade inside.
    cfg.tablePath.foreach { p =>
      try IcebergLite.assertNoDeletes(spark, p)
      catch { case e: IcebergLite.DeleteGuardError => throw EngineError(400, e.getMessage) }
    }

    // Plan the dialect rewrites text-only, validate, THEN run the binders:
    // a statement the guard rejects must not trigger catalog HTTP fetches,
    // Iceberg metadata/footer IO, or temp-view creation as side effects.
    val converted = DialectRewriter.convertDuckDbDialect(
      DialectRewriter.convertReadParquet(sql, cfg))
    // Known-DuckDB functions with no safe Spark mapping get a precise 400
    // naming the limitation (and the supported surface) instead of
    // Spark's UNRESOLVED_ROUTINE — same design as the flat-file leftover
    // detector, run only on statements about to execute on Spark.
    try DialectRewriter.rejectUnknownDuckFunctions(converted)
    catch { case e: IllegalArgumentException => throw EngineError(400, e.getMessage) }
    val (bound, binders) =
      try DialectRewriter.plan(spark, converted, cfg) // text-only (may reject a malformed travel timestamp)
      catch { case e: Exception => throw EngineError(400, s"Query execution failed: ${e.getMessage}") }

    SqlGuard.validate(spark, bound) match {
      case Left(r) => throw EngineError(400, r.message)
      case Right(_) => ()
    }

    try binders.foreach(_.apply())
    catch { case e: Exception => throw EngineError(400, s"Query execution failed: ${e.getMessage}") }

    val df =
      try spark.sql(bound)
      catch { case e: Exception => throw EngineError(400, s"Query execution failed: ${firstLine(e)}") }
    val (limited, _) = LimitInjector(df, rowLimit)

    val rows =
      try limited.collect()
      catch { case e: Exception => throw EngineError(400, s"Query execution failed: ${firstLine(e)}") }

    val elapsedMs = (System.nanoTime() - t0) / 1000000
    val scanned = bytesScanned(limited.queryExecution.executedPlan)
    val bytes =
      if (scanned > 0) scanned
      // Reference-style fallback estimate (main.py:594-595) when no file
      // scan metric is available (e.g. VALUES-only queries).
      else rows.iterator.map(r => String.valueOf(r).length.toLong * 2).sum

    QueryResult(
      columns = limited.columns.toSeq,
      rows = rows.toSeq.map(_.toSeq),
      stats = QueryStats(elapsedMs, bytes, rows.length.toLong),
      truncated = rows.length >= rowLimit)
  }

  /** Result of one maintenance compaction request: the delete-applying
    * rewrite's counts plus the small-file compaction's.
    */
  final case class MaintenanceResult(
      deletesApplied: Boolean, rewriteRewritten: Int, rewriteWritten: Int,
      compactRewritten: Int, compactWritten: Int)

  /** Maintenance endpoints mutate tables, so unlike the read-only query
    * path they are OFF by default; `-Dgraft.gateway.maintenance=true`
    * (or GRAFT_MAINTENANCE=true) opts in.
    */
  def maintenanceEnabled: Boolean =
    sys.props.get("graft.gateway.maintenance")
      .orElse(sys.env.get("GRAFT_MAINTENANCE"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))

  /** Table maintenance: the delete guard's own remediation ("compact the
    * table first") run in-house — a delete-applying rewrite when the
    * table carries row-level deletes (no-op otherwise), then small-file
    * compaction. Mirrors what the reference documents as an external
    * `rewrite_data_files` call (backend/main.py:398-414).
    */
  def runCompaction(root: SparkSession, config: ConnectionConfig,
      targetBytes: Long = 128L << 20,
      tablePath: Option[String] = None): MaintenanceResult = {
    if (!maintenanceEnabled)
      throw EngineError(403,
        "maintenance is disabled: compaction rewrites table data, so it is " +
          "off by default on this read-only gateway; start with " +
          "-Dgraft.gateway.maintenance=true (or GRAFT_MAINTENANCE=true) to enable it")
    val cfg = Try(ConnectionConfig.validated(config)) match {
      case Success(c) => c
      case Failure(e) => throw EngineError(400, e.getMessage)
    }
    // A request-level tablePath (any path iceberg_scan could address —
    // same trust model as the SQL table function) wins over the
    // connection's S3-only tablePath field.
    val path = tablePath.filter(_.nonEmpty).orElse(cfg.tablePath).getOrElse(
      throw EngineError(400, "tablePath is required for compaction"))
    val spark = root.newSession()
    graft.functions.GraftFunctions.register(spark)
    applyStorageSettings(spark, cfg)
    try {
      val rw = IcebergLiteWriter.rewriteApplyingDeletes(spark, path)
      val cp = IcebergLiteWriter.compact(spark, path, targetBytes)
      MaintenanceResult(rw.written > 0, rw.rewritten, rw.written,
        cp.rewritten, cp.written)
    } catch {
      case e: IcebergLite.ProbeError => throw EngineError(400, e.getMessage)
      case e: Exception => throw EngineError(400, s"Compaction failed: ${firstLine(e)}")
    }
  }

  /** Apply the request's storage settings as PER-SESSION per-bucket S3A
    * overrides: `fs.s3a.bucket.<bucket>.*` entries on the request
    * session's own conf (each request is a `newSession()` with an
    * isolated SQLConf). The keys are deliberately UN-prefixed:
    * `SessionState.newHadoopConf` copies every session conf entry into
    * the Hadoop configuration VERBATIM (the `spark.hadoop.` stripping
    * happens only for the static SparkConf at SparkContext startup), so
    * an un-prefixed key is exactly what reaches S3A on Spark's own
    * parquet-read path; a `spark.hadoop.`-prefixed session key would be
    * copied with its prefix intact and never consulted. The Iceberg-lite
    * metadata chain applies the same verbatim merge
    * (IcebergLite.sessionHadoopConf) — so two CONCURRENT requests
    * carrying different credentials for the SAME bucket each resolve
    * their own, and the process-global `sparkContext.hadoopConfiguration`
    * is never mutated (SURVEY.md §7.3's "genuinely hard part"; the
    * reference fixed the analogous shared-connection race with a
    * per-request lock, main.py:262-272 — per-session conf is the
    * shared-nothing version of that fix).
    */
  def applyStorageSettings(spark: SparkSession, cfg: ConnectionConfig): Unit =
    cfg.tablePath.filter(_.startsWith("s3://")).foreach { p =>
      val bucket = p.stripPrefix("s3://").takeWhile(_ != '/')
      ConnectionConfig.s3aSettings(cfg).foreach { case (k, v) =>
        spark.conf.set(k.replace("fs.s3a.", s"fs.s3a.bucket.$bucket."), v)
      }
    }

  /** Real scan-size metric off the executed plan (vs the reference's
    * acknowledged `len(str(rows)) * 2` placeholder): sum of file-scan
    * `filesSize` metrics, descending through AQE's adaptive root.
    */
  def bytesScanned(plan: SparkPlan): Long = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      // AQE query stages have no children; the materialized subtree
      // hangs off .plan.
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    walk(plan)
      .flatMap(p => p.metrics.get("filesSize").map(_.value).filter(_ > 0))
      .sum
  }

  /** Connection test orchestration (reference `run_connection_test`,
    * main.py:529-564): REST catalog -> list tables; tablePath -> probe;
    * neither -> probe the bundled demo table. Failures return None — the
    * detail is deliberately not surfaced to unauthenticated callers.
    */
  def runConnectionTest(
      root: SparkSession,
      config: ConnectionConfig,
      demoTablePath: Option[String] = None): Option[TableInfo] =
    Try {
      val cfg = ConnectionConfig.validated(config)
      val spark = root.newSession()
      // The probe needs the request's credentials exactly like a query
      // does — with strictly per-session settings there is no global
      // fallback that could accidentally make it work.
      applyStorageSettings(spark, cfg)
      if (cfg.catalogType == "rest") {
        // List the namespace's tables over the REST catalog API — the
        // analog of the reference's `SHOW TABLES FROM iceberg_catalog.ns`
        // probe after ATTACH (main.py:543-549): any HTTP/parse failure
        // lands in the enclosing Try -> None, like the reference's generic
        // connection-test failure path.
        val ns = cfg.namespace.getOrElse("default")
        graft.sources.RestCatalogClient.fromConfig(cfg).listTables(ns)
        TableInfo(
          path = s"iceberg_catalog.$ns",
          suggestedQuery = s"SHOW TABLES FROM iceberg_catalog.$ns")
      } else cfg.tablePath match {
        case Some(p) => IcebergLite.probe(spark, p)
        case None =>
          val demo = demoTablePath.getOrElse(
            throw IcebergLite.ProbeError("no demo table configured"))
          IcebergLite.scan(spark, demo).limit(1).collect()
          IcebergLite.probe(spark, demo)
      }
    }.toOption

  private def firstLine(e: Throwable): String =
    Option(e.getMessage).map(_.linesIterator.next()).getOrElse(e.getClass.getSimpleName)
}
