package graft.gateway

import java.util.concurrent.atomic.AtomicLong

import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession

import graft.sources.IcebergLite

/** SQL-string rewrites performed before parsing, mirroring the reference's
  * `_convert_to_iceberg_query` (/root/reference/backend/main.py:426-449)
  * plus the `iceberg_scan('path')` table-function surface
  * (main.py:440,464,556) that Spark SQL lacks.
  *
  * 1. read_parquet over an s3 parquet glob (legacy escape hatch) ->
  *    `iceberg_scan('s3://bucket/path')`, or a
  *    `iceberg_catalog.<ns>.<table>` reference when a REST catalog is
  *    configured (table name = last path segment).
  * 2. `iceberg_scan('path')` -> a generated temp view bound to an
  *    IcebergLite table scan for that path (SURVEY.md A4, option (i)).
  */
object DialectRewriter {

  // Same shape as the reference's pattern (main.py:430): bucket, inner
  // path, optional glob tail, case-insensitive, ' or " quotes.
  private val ReadParquetRe: Regex =
    """(?i)read_parquet\(['"]s3://([^/'"]+)/([^'"]+?)/?\*?\*?/?\*?\.parquet['"]\)""".r

  // Optional second argument = time travel, accepted as a snapshot id
  // (`iceberg_scan('p', 123)` / `snapshot_id => 123`) or a committed-at
  // bound (`timestamp => '2026-01-01T00:00:00Z'`, also bare
  // `'2026-01-01 00:00:00'`) resolved via the snapshot log — the
  // `TIMESTAMP AS OF` analog.
  private val IcebergScanRe: Regex =
    ("""(?i)iceberg_scan\(\s*['"]([^'"]+)['"]\s*""" +
      """(?:,\s*(?:snapshot_id\s*=>\s*)?(\d+)\s*|,\s*(?:timestamp\s*=>\s*)?['"]([^'"]+)['"]\s*)?\)""").r

  /** `iceberg_changes('path', from_snapshot => N [, to_snapshot => M])` —
    * the SQL surface over [[IcebergLite.incrementalScan]]: exactly the
    * rows appended AFTER snapshot N (up to M or current). The CDC read
    * pattern an incremental pipeline polls with; non-append ranges
    * (compaction/delete commits) refuse rather than emitting wrong
    * deltas, surfacing as a 400 through the gateway.
    */
  private val IcebergChangesRe: Regex =
    ("""(?i)iceberg_changes\(\s*['"]([^'"]+)['"]\s*,\s*(?:from_snapshot\s*=>\s*)?(\d+)\s*""" +
      """(?:,\s*(?:to_snapshot\s*=>\s*)?(\d+)\s*)?\)""").r

  /** ISO instant, or local "yyyy-MM-dd[ HH:mm:ss]" taken as UTC. */
  private[gateway] def parseTravelTimestamp(s: String): Long =
    scala.util.Try(java.time.Instant.parse(s).toEpochMilli).getOrElse {
      val norm = if (s.contains(" ")) s.replace(" ", "T") else s
      val withTime = if (norm.contains("T")) norm else norm + "T00:00:00"
      java.time.LocalDateTime.parse(withTime)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  private val viewCounter = new AtomicLong(0)

  /** Rewrite 1: legacy read_parquet globs to the Iceberg surface. */
  def convertReadParquet(sql: String, config: ConnectionConfig): String =
    ReadParquetRe.replaceAllIn(sql, m => {
      val bucket = m.group(1)
      val path = m.group(2).reverse.dropWhile(c => c == '*' || c == '/').reverse
      val replacement =
        if (config.catalogType == "rest") {
          val tableName = path.split('/').last
          s"iceberg_catalog.${config.namespace.getOrElse("default")}.$tableName"
        } else s"iceberg_scan('s3://$bucket/$path')"
      Regex.quoteReplacement(replacement)
    })

  /** Rewrite 2: bind each iceberg_scan('p') occurrence to a temp view
    * backed by an IcebergLite scan of `p` on this session, and substitute
    * the view name into the SQL. View names are generated (never derived
    * from user input) so this introduces no injection surface.
    */
  private val IcebergMetadataRe: Regex =
    """(?i)iceberg_metadata\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val IcebergSnapshotsRe: Regex =
    """(?i)iceberg_snapshots\(\s*['"]([^'"]+)['"]\s*\)""".r

  // `iceberg_catalog.<ns>.<table>` references and the reference's
  // suggested `SHOW TABLES FROM iceberg_catalog.<ns>` probe, resolved
  // through the REST catalog (A9). Identifier charset is enforced on the
  // TABLE NAMES RETURNED BY THE CATALOG too — a hostile catalog response
  // must not become a SQL fragment.
  private val CatalogRefRe: Regex =
    """(?i)\biceberg_catalog\.([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)""".r
  private val ShowTablesRe: Regex =
    """(?i)SHOW\s+TABLES\s+(?:FROM|IN)\s+iceberg_catalog\.([A-Za-z_][A-Za-z0-9_]*)""".r
  private val SafeIdentRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Rewrite 3 (REST catalogs only): `SHOW TABLES FROM iceberg_catalog.ns`
    * becomes a (namespace, tableName) listing view over the catalog's
    * table list, and each `iceberg_catalog.ns.tbl` reference becomes a
    * temp view over the table's REST-loaded `metadata-location` via the
    * IcebergLite chain — the analog of the reference's ATTACH'd catalog
    * (main.py:317-358).
    *
    * TEXT-ONLY: substitutes generated view names and returns the binders
    * that perform the catalog HTTP fetches, metadata/footer IO, and temp-
    * view creation. Callers validate the rewritten SQL first, so a
    * statement the guard rejects triggers no network or filesystem side
    * effects.
    */
  def planCatalogRefs(spark: SparkSession, sql: String,
      config: ConnectionConfig): (String, Seq[() => Unit]) = {
    if (config.catalogType != "rest" ||
        !sql.toLowerCase(java.util.Locale.ROOT).contains("iceberg_catalog."))
      return (sql, Nil)
    lazy val client = graft.sources.RestCatalogClient.fromConfig(config)
    val binders = Seq.newBuilder[() => Unit]
    val afterShow = ShowTablesRe.replaceAllIn(sql, m => {
      val ns = m.group(1)
      val view = s"graft_iceberg_catalog_listing_${viewCounter.incrementAndGet()}"
      binders += (() => {
        // Identifier charset is enforced on the names RETURNED by the
        // catalog too — a hostile catalog response must not become a SQL
        // fragment (they land in a DataFrame here, but stay consistent
        // with the reference-shape listing).
        val names = client.listTables(ns).filter(SafeIdentRe.matches)
        spark.createDataFrame(names.map(n => (ns, n)))
          .toDF("namespace", "tableName")
          .createOrReplaceTempView(view)
      })
      Regex.quoteReplacement(s"SELECT namespace, tableName FROM $view")
    })
    val bound = CatalogRefRe.replaceAllIn(afterShow, m => {
      val (ns, tbl) = (m.group(1), m.group(2))
      val view = s"graft_iceberg_catalog_${viewCounter.incrementAndGet()}"
      binders += (() => {
        val loc = client.metadataLocation(ns, tbl)
        val tableRoot = loc.replaceAll("/metadata/[^/]+$", "")
        IcebergLite.scan(spark, tableRoot, metadataLocation = Some(loc))
          .createOrReplaceTempView(view)
      })
      Regex.quoteReplacement(view)
    })
    (bound, binders.result())
  }

  /** Text-only planning for the `iceberg_scan` / `iceberg_metadata` /
    * `iceberg_snapshots` table functions; same deferred-binder contract as
    * [[planCatalogRefs]].
    */
  def planIcebergScans(spark: SparkSession, sql: String): (String, Seq[() => Unit]) = {
    val binders = Seq.newBuilder[() => Unit]
    val scans = IcebergScanRe.replaceAllIn(sql, m => {
      val path = m.group(1)
      val snapshotId = Option(m.group(2)).map(_.toLong)
      val asOfMillis = Option(m.group(3)).map(parseTravelTimestamp)
      val view = s"graft_iceberg_scan_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.scan(spark, path, snapshotId, asOfMillis).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withChanges = IcebergChangesRe.replaceAllIn(scans, m => {
      val path = m.group(1)
      val from = m.group(2).toLong
      val to = Option(m.group(3)).map(_.toLong)
      val view = s"graft_iceberg_changes_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.incrementalScan(spark, path, from, to).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withMeta = IcebergMetadataRe.replaceAllIn(withChanges, m => {
      val path = m.group(1)
      val view = s"graft_iceberg_metadata_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.metadataRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val bound = IcebergSnapshotsRe.replaceAllIn(withMeta, m => {
      val path = m.group(1)
      val view = s"graft_iceberg_snapshots_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.snapshotsRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    (bound, binders.result())
  }

  /** Full planning pass: catalog refs then scan functions, text-only.
    * Returns the rewritten SQL (safe to validate) and the IO binders to
    * run — in order — once validation accepts the statement.
    */
  def plan(spark: SparkSession, sql: String,
      config: ConnectionConfig): (String, Seq[() => Unit]) = {
    val (afterCatalog, catalogBinders) = planCatalogRefs(spark, sql, config)
    val (bound, scanBinders) = planIcebergScans(spark, afterCatalog)
    (bound, catalogBinders ++ scanBinders)
  }

  /** Immediate-execution forms (tests, ad-hoc callers): plan + bind. */
  def bindCatalogRefs(spark: SparkSession, sql: String, config: ConnectionConfig): String = {
    val (bound, binders) = planCatalogRefs(spark, sql, config)
    binders.foreach(_.apply())
    bound
  }

  def bindIcebergScans(spark: SparkSession, sql: String): String = {
    val (bound, binders) = planIcebergScans(spark, sql)
    binders.foreach(_.apply())
    bound
  }
}
