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
      """(?:,\s*(?:snapshot_id\s*=>\s*)?(\d+)\s*|,\s*ref\s*=>\s*['"]([^'"]+)['"]\s*""" +
      """|,\s*(?:timestamp\s*=>\s*)?['"]([^'"]+)['"]\s*)?\)""").r

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
  private val IcebergFilesRe: Regex =
    """(?i)iceberg_files\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val IcebergPartitionsRe: Regex =
    """(?i)iceberg_partitions\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val IcebergHistoryRe: Regex =
    """(?i)iceberg_history\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val IcebergRefsRe: Regex =
    """(?i)iceberg_refs\(\s*['"]([^'"]+)['"]\s*\)""".r

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

  // DuckDB's flat-file table functions (read_csv/read_csv_auto with
  // header+type inference, read_json/read_json_auto line-JSON, and
  // read_parquet over a single local/posix path — the s3 GLOB form was
  // already rewritten to iceberg_scan by convertReadParquet, mirroring
  // the reference; a plain path stays a plain parquet read).
  private val ReadCsvRe: Regex =
    """(?i)\bread_csv(?:_auto)?\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val ReadJsonRe: Regex =
    """(?i)\bread_(?:nd)?json(?:_auto|_objects)?\(\s*['"]([^'"]+)['"]\s*\)""".r
  private val ReadParquetPlainRe: Regex =
    """(?i)\bread_parquet\(\s*['"]([^'"]+)['"]\s*\)""".r

  // Any flat-file reader call the single-path rewrites above did NOT
  // consume — named options, path lists, computed paths. Detected after
  // the rewrites so the user gets a precise 400 instead of Spark's
  // misleading "undefined function read_csv".
  private val FlatFileLeftoverRe: Regex =
    """(?i)\b(read_(?:csv|(?:nd)?json|parquet)(?:_auto|_objects)?)\s*\(""".r

  /** Opt-in gate for the flat-file readers (read_csv/read_json and plain-
    * path read_parquet): unlike `iceberg_scan` — whose Iceberg/parquet
    * layout requirement bounds what it can exfiltrate — these read ANY
    * text file the gateway process can open, through an endpoint that is
    * unauthenticated and serves CORS '*' (the reference's own trust model,
    * where DuckDB allows local reads by default — but a wider surface).
    * They are therefore DISABLED unless `-Dgraft.gateway.flatFileRoot=...`
    * (or env GRAFT_FLATFILE_ROOT) names the allowed root directories
    * (comma-separated path prefixes, compared after normalization so `..`
    * traversal cannot escape; `*` = no restriction, the reference's
    * behavior). Checked at PLAN time — a rejected path never reaches
    * validation, binding, or IO.
    */
  private[gateway] def flatFileRoots: Option[Seq[String]] =
    sys.props.get("graft.gateway.flatFileRoot")
      .orElse(sys.env.get("GRAFT_FLATFILE_ROOT"))
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)

  private def checkFlatFilePath(fn: String, path: String): Unit = {
    val roots = flatFileRoots.getOrElse(throw new IllegalArgumentException(
      s"$fn is disabled: flat-file reads are gated off by default; start the " +
        "gateway with -Dgraft.gateway.flatFileRoot=<root[,root2]> (or " +
        "GRAFT_FLATFILE_ROOT; '*' for no restriction) to enable them"))
    if (!roots.contains("*")) {
      // Lexical normalization blocks `..` traversal but not symlinks: a
      // link under an allowed root pointing outside it would pass a purely
      // lexical prefix test. When the path exists on this filesystem,
      // resolve it (and each root) to its canonical form first; glob
      // patterns and not-yet-existing paths fall back to the lexical
      // check, which is still `..`-safe.
      def canonical(p: String): String =
        try {
          val jp = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(jp)) jp.toRealPath().toString
          else jp.normalize().toString
        } catch { case _: Exception => p }
      val norm = canonical(path)
      val allowed = roots.exists { r =>
        val rn = canonical(r)
        // Exact match or a "/"-separated descendant — a plain prefix test
        // would let /data-evil slip past an allowed root of /data.
        norm == rn || norm.startsWith(rn + "/")
      }
      if (!allowed) throw new IllegalArgumentException(
        s"$fn path '$path' is outside the allowed flat-file roots")
    }
  }

  /** Index ranges of string literals, quoted identifiers, and comments —
    * table-function rewrites must not fire (and bind IO!) for text that
    * is not code, e.g. `-- read_csv('/x')` or a data literal mentioning
    * `iceberg_scan`.
    */
  private def protectedRanges(sql: String): IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val j = skipQuoted(sql, i); out += ((i, j)); i = j
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val j = sql.indexOf('\n', i) match { case -1 => n; case k => k }
        out += ((i, j)); i = j
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val j = sql.indexOf("*/", i + 2) match { case -1 => n; case k => k + 2 }
        out += ((i, j)); i = j
      } else i += 1
    }
    out.result()
  }

  /** replaceAllIn, except matches that START inside a protected range are
    * left untouched (both the text and — crucially — the side-effecting
    * binder that `f` would have registered).
    */
  private def replaceOutsideLiterals(re: Regex, sql: String)(
      f: Regex.Match => String): String = {
    val ranges = protectedRanges(sql)
    re.replaceAllIn(sql, m =>
      if (ranges.exists { case (a, b) => m.start >= a && m.start < b })
        Regex.quoteReplacement(m.matched)
      else f(m))
  }

  /** Text-only planning for the `iceberg_scan` / `iceberg_metadata` /
    * `iceberg_snapshots` table functions plus DuckDB's flat-file readers;
    * same deferred-binder contract as [[planCatalogRefs]].
    *
    * Trust model: paths reach `spark.read` exactly like `iceberg_scan`
    * paths always have — the gateway is a self-hosted query endpoint
    * whose engine can read what its process can read, the same contract
    * as the reference's DuckDB (read_csv/read_parquet of any local file
    * is reference behavior, not an extension).
    */
  def planIcebergScans(spark: SparkSession, sql: String): (String, Seq[() => Unit]) = {
    val binders = Seq.newBuilder[() => Unit]
    val scans = replaceOutsideLiterals(IcebergScanRe, sql)(m => {
      val path = m.group(1)
      val snapshotId = Option(m.group(2)).map(_.toLong)
      val refName = Option(m.group(3))
      val asOfMillis = Option(m.group(4)).map(parseTravelTimestamp)
      val view = s"graft_iceberg_scan_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.scan(spark, path, snapshotId, asOfMillis, ref = refName)
          .createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withChanges = replaceOutsideLiterals(IcebergChangesRe, scans)(m => {
      val path = m.group(1)
      val from = m.group(2).toLong
      val to = Option(m.group(3)).map(_.toLong)
      val view = s"graft_iceberg_changes_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.incrementalScan(spark, path, from, to).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withMeta = replaceOutsideLiterals(IcebergMetadataRe, withChanges)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_metadata_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.metadataRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withSnaps = replaceOutsideLiterals(IcebergSnapshotsRe, withMeta)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_snapshots_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.snapshotsRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withFiles = replaceOutsideLiterals(IcebergFilesRe, withSnaps)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_files_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.filesRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withParts = replaceOutsideLiterals(IcebergPartitionsRe, withFiles)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_partitions_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.partitionsRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withHistory = replaceOutsideLiterals(IcebergHistoryRe, withParts)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_history_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.historyRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withRefs = replaceOutsideLiterals(IcebergRefsRe, withHistory)(m => {
      val path = m.group(1)
      val view = s"graft_iceberg_refs_${viewCounter.incrementAndGet()}"
      binders += (() =>
        IcebergLite.refsRelation(spark, path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withCsv = replaceOutsideLiterals(ReadCsvRe, withRefs)(m => {
      val path = m.group(1)
      checkFlatFilePath("read_csv", path)
      val view = s"graft_read_csv_${viewCounter.incrementAndGet()}"
      binders += (() => spark.read
        .option("header", "true").option("inferSchema", "true")
        .csv(path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val withJson = replaceOutsideLiterals(ReadJsonRe, withCsv)(m => {
      val path = m.group(1)
      checkFlatFilePath("read_json", path)
      val view = s"graft_read_json_${viewCounter.incrementAndGet()}"
      binders += (() => spark.read.json(path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    val bound = replaceOutsideLiterals(ReadParquetPlainRe, withJson)(m => {
      val path = m.group(1)
      checkFlatFilePath("read_parquet", path)
      val view = s"graft_read_parquet_${viewCounter.incrementAndGet()}"
      binders += (() => spark.read.parquet(path).createOrReplaceTempView(view))
      Regex.quoteReplacement(view)
    })
    // A reader call the single-path rewrites did not consume (named
    // options, a path list, a computed path) would otherwise surface as
    // Spark's "undefined function read_csv" — a baffling error for a
    // function the gateway nominally supports. Reject it here with the
    // actual limitation instead.
    locally {
      val ranges = protectedRanges(bound)
      FlatFileLeftoverRe.findAllMatchIn(bound)
        .find(m => !ranges.exists { case (a, b) => m.start >= a && m.start < b })
        .foreach(m => throw new IllegalArgumentException(
          s"${m.group(1)}: only the single-quoted-path form is supported " +
            s"(e.g. ${m.group(1)}('/path/to/file')); named options, path " +
            "lists, and computed paths are not"))
    }
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

  // --- DuckDB-dialect function surface ------------------------------------

  /** DuckDB function names with a drop-in Spark equivalent: a pure rename
    * suffices because argument order and semantics line up, and none of
    * these names is a valid Spark function — so Spark-dialect SQL passes
    * through byte-identical. `string_split_regex` maps straight onto
    * Spark's `split` (both take a regex); the literal-delimiter
    * `string_split` family is handled separately below.
    */
  private val DuckRenames: Map[String, String] = Map(
    "unnest" -> "explode",
    // DuckDB's len is string length AND list cardinality; Spark's own
    // `len` builtin is string-only, so a rename to it (or to `length`)
    // breaks len(list_col). The target is graft's duck_len
    // (functions.DuckLen, registered per gateway session by Engine), a
    // RuntimeReplaceable dispatching on the resolved argument type —
    // identical to the builtin for strings, Size for arrays/maps.
    "len" -> "duck_len",
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "generate_series" -> "sequence",
    "string_split_regex" -> "split",
    "str_split_regex" -> "split",
    "list_contains" -> "array_contains",
    "list_distinct" -> "array_distinct",
    "list_sort" -> "sort_array",
    "list_min" -> "array_min",
    "list_max" -> "array_max",
    "array_to_string" -> "array_join",
    // r11 additions — still pure renames with aligned semantics:
    // arg_min/arg_max are Spark's min_by/max_by; list_value builds an
    // array; list_concat is Spark's array concat; list_reverse is
    // reverse; list_append/list_prepend match array_append/array_prepend
    // (Spark 3.4/3.5+); regexp_matches and regexp_like both do partial
    // (find-style) matching on two args — the 3-arg flags form fails
    // arity at analysis, loudly.
    "arg_min" -> "min_by",
    "arg_max" -> "max_by",
    // r12: DuckDB's integer epoch extractors are Spark's unix_* family —
    // both return BIGINT ms/us since the epoch for a timestamp argument.
    // (DuckDB also overloads epoch_ms(BIGINT) as ms->timestamp; that
    // form fails Spark analysis loudly, the regexp_matches precedent.
    // Plain `epoch` returns DOUBLE seconds and epoch_ns has no Spark
    // counterpart — both stay precisely rejected.)
    "epoch_ms" -> "unix_millis",
    "epoch_us" -> "unix_micros",
    "list_value" -> "array",
    "list_concat" -> "concat",
    "list_reverse" -> "reverse",
    "list_append" -> "array_append",
    "list_prepend" -> "array_prepend",
    "regexp_matches" -> "regexp_like")

  /** DuckDB functions with NO safe Spark rename (different return
    * contract, lambda-as-string arguments, or format-code languages that
    * do not line up). Detected at call positions so a user gets a precise
    * 400 naming the limitation instead of Spark's UNRESOLVED_ROUTINE for
    * a function the gateway nominally speaks the dialect of — the same
    * design as the flat-file leftover detector. list_position/
    * list_intersect are here deliberately: Spark's array_position returns
    * 0 (not NULL) on a miss and array_intersect dedups, so a rename would
    * silently change answers.
    */
  private val DuckUnsupported: Set[String] = Set(
    "list_aggregate", "list_aggr", "list_apply", "list_reduce",
    "list_unique", "list_has_any", "list_has_all",
    "list_position", "list_indexof", "list_intersect",
    "struct_insert",
    "epoch", "epoch_ns")

  /** DuckDB's C-style format-code functions (r12): translated to
    * date_format/to_timestamp when the format is a string literal whose
    * codes all sit in [[FormatCodes]]; anything else keeps a precise 400
    * naming the exact reason (unknown code, computed format, arity).
    */
  private val DuckFormatFns = Set("strftime", "strptime")

  /** C strftime code → Spark datetime pattern fragment. Only codes whose
    * Spark pattern is value-identical are mapped — %g (DuckDB millis) and
    * %n (nanos) are deliberately absent: a wrong fraction width would
    * silently change answers, the list_position design rule.
    */
  private[gateway] val FormatCodes: Map[String, String] = Map(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss",
    "%f" -> "SSSSSS", "%j" -> "DDD", "%p" -> "a",
    "%a" -> "EEE", "%A" -> "EEEE", "%b" -> "MMM", "%B" -> "MMMM",
    "%-d" -> "d", "%-m" -> "M", "%-H" -> "H", "%-I" -> "h",
    "%-M" -> "m", "%-S" -> "s", "%-j" -> "D", "%%" -> "%")

  /** Codes whose FORMATTING is value-identical but whose PARSING
    * diverges: C strptime maps two-digit years 69-99 to the 1900s while
    * Spark's 'yy' (Java reduced-year, base 2000) parses every two-digit
    * value into 2000-2099, so strptime('69-01-01', '%y-%m-%d') would
    * silently return 2069 instead of 1969 — the silent value change the
    * %g/%n exclusion rule forbids. strftime keeps these (a two-digit
    * year PRINTS identically); strptime gets the precise 400.
    */
  private[gateway] val FormatOnlyCodes: Set[String] = Set("%y")

  /** Translate a C strftime format string into a Spark datetime pattern.
    * Literal runs containing a letter (or a quote) are single-quoted —
    * letters are pattern-reserved in Java's DateTimeFormatter and an
    * embedded quote doubles. Left(reason) on any code outside the table,
    * or (when `parsing`) on a [[FormatOnlyCodes]] member.
    */
  private[gateway] def translateFormat(fmt: String,
      parsing: Boolean = false): Either[String, String] = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(c => c.isLetter || c == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%') {
        val code =
          if (i + 2 < fmt.length && fmt.charAt(i + 1) == '-') fmt.substring(i, i + 3)
          else if (i + 1 < fmt.length) fmt.substring(i, i + 2)
          else return Left("dangling % at end of format")
        FormatCodes.get(code) match {
          case Some(_) if parsing && FormatOnlyCodes(code) => return Left(
            s"format code $code parses differently in Spark (two-digit years " +
              "69-99 read as 2069-2099, not 1969-1999); it is supported for " +
              "strftime only")
          case Some("%") => lit.append('%') // %% is literal text
          case Some(p) => flush(); out.append(p)
          case None => return Left(
            s"format code $code has no exact Spark datetime-pattern equivalent " +
              s"(supported: ${FormatCodes.keys.toSeq.sorted.mkString(" ")})")
        }
        i += code.length
      } else { lit.append(fmt.charAt(i)); i += 1 }
    }
    flush()
    Right(out.toString)
  }

  /** DuckDB's struct constructors/accessors (r12): translated when the
    * shape maps exactly — `struct_pack(a := x, b := y)` is Spark's
    * `named_struct('a', x, 'b', y)` (construction and `.field` access
    * align), and `struct_extract(s, 'a')` is the parenthesized field
    * access `(s).a`. Anything else (positional struct_extract,
    * struct_insert, malformed := args) keeps a precise 400.
    */
  private val DuckStructFns = Set("struct_pack", "struct_extract")

  private val StructFieldRe: Regex =
    """^([A-Za-z_][A-Za-z0-9_]*)\s*:=\s*([\s\S]+)$""".r

  private def translateStructCall(word: String, sql: String,
      open: Int): Either[String, (String, Int)] =
    splitArgs(sql, open) match {
      case Some((args, close)) if word == "struct_pack" =>
        val trimmed = args.map(_.trim)
        if (trimmed.isEmpty || trimmed == Seq(""))
          Left("struct_pack needs at least one name := value argument")
        else {
          val fields = trimmed.map {
            case StructFieldRe(name, value) =>
              Right(s"'$name', ${convertDuckDbDialect(value.trim)}")
            case other => Left(
              s"struct_pack argument '$other' is not of the form name := value")
          }
          fields.collectFirst { case Left(reason) => Left(reason) }.getOrElse {
            val inner = fields.collect { case Right(f) => f }.mkString(", ")
            Right((s"named_struct($inner)", close))
          }
        }
      case Some((args, close)) if args.length == 2 => // struct_extract
        val field = args(1).trim match {
          case SimpleLiteralRe(body)
              if body.matches("[A-Za-z_][A-Za-z0-9_]*") => Some(body)
          case _ => None
        }
        field match {
          case Some(f) =>
            Right((s"(${convertDuckDbDialect(args.head.trim)}).$f", close))
          case None => Left("struct_extract needs a string-literal field name " +
            "(positional extraction has no Spark equivalent)")
        }
      case Some((args, _)) =>
        Left(s"$word takes (struct, field); got ${args.length} arguments")
      case None => Left(s"$word call has unbalanced parentheses")
    }

  /** Attempt to translate a `strftime`/`strptime` call whose opening
    * paren sits at `open`: Right((replacement, closeIdx)) or Left(reason).
    * The format is identified as the string-literal argument containing a
    * `%` code, so both DuckDB's (value, format) order and the Python-ish
    * (format, value) order translate. TOTAL over arbitrary text — the
    * convert pre-pass leaves Left cases untouched and the reject pass
    * turns the same Left into the precise 400.
    */
  private def translateFormatCall(word: String, sql: String,
      open: Int): Either[String, (String, Int)] =
    splitArgs(sql, open) match {
      case Some((args, close)) if args.length == 2 =>
        val trimmed = args.map(_.trim)
        def isFmtLiteral(a: String) = a match {
          case SimpleLiteralRe(body) => body.contains('%')
          case _ => false
        }
        // DuckDB's documented order is (value, format): prefer arg 2 as
        // the format whenever it qualifies, so a VALUE literal that
        // happens to contain '%' (strptime('12%M', '%H:%M')) can never
        // be mistaken for the format; arg 1 is only consulted for the
        // Python-ish (format, value) order.
        val fmtIdx =
          if (isFmtLiteral(trimmed(1))) 1
          else if (isFmtLiteral(trimmed(0))) 0
          else -1
        if (fmtIdx < 0)
          Left(s"$word needs a string-literal format containing % codes " +
            "(a computed format cannot be translated at rewrite time)")
        else {
          val body = SimpleLiteralRe.findFirstMatchIn(trimmed(fmtIdx)).get.group(1)
          translateFormat(body.replace("''", "'"),
              parsing = word == "strptime").map { pattern =>
            val value = convertDuckDbDialect(trimmed(1 - fmtIdx))
            val patLit =
              "'" + pattern.replace("\\", "\\\\").replace("'", "''") + "'"
            val fn = if (word == "strftime") "date_format" else "to_timestamp"
            (s"$fn($value, $patLit)", close)
          }
        }
      case Some((args, _)) =>
        Left(s"$word takes (value, format); got ${args.length} arguments")
      case None => Left(s"$word call has unbalanced parentheses")
    }

  private[gateway] def unsupportedDuckDbMessage(fn: String): String =
    s"unsupported DuckDB function $fn; supported DuckDB-dialect functions: " +
      (DuckRenames.keys ++ DuckSplitNames).toSeq.sorted.mkString(", ") +
      "; plus strftime/strptime with a string-literal format, " +
      "read_csv/read_json/read_parquet single-path forms, " +
      "iceberg_scan/iceberg_* table functions, and bracket slices x[i:j]"

  /** Reject known-DuckDB functions with no mapping, at CALL positions
    * outside literals/identifiers/comments. A separate pass — NOT inside
    * [[convertDuckDbDialect]] — so the pre-pass itself stays TOTAL and
    * idempotent over any text (the oracle corpus legitimately contains
    * `struct_pack` destined for DuckDB); the gateway calls this only on
    * statements about to run on Spark.
    */
  def rejectUnknownDuckFunctions(sql: String): Unit = {
    val ranges = protectedRanges(sql)
    val n = sql.length
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    var i = 0
    while (i < n) {
      if (ranges.exists { case (a, b) => i >= a && i < b }) {
        // Skip to the end of the protected range containing i.
        i = ranges.collectFirst { case (a, b) if i >= a && i < b => b }.get
      } else {
        val c = sql.charAt(i)
        if (isWordChar(c) && !c.isDigit && (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
          var j = i
          while (j < n && isWordChar(sql.charAt(j))) j += 1
          val word = sql.substring(i, j).toLowerCase(java.util.Locale.ROOT)
          var k = j
          while (k < n && sql.charAt(k).isWhitespace) k += 1
          if (k < n && sql.charAt(k) == '(' && DuckUnsupported.contains(word))
            throw new IllegalArgumentException(unsupportedDuckDbMessage(word))
          if (k < n && sql.charAt(k) == '(' && DuckFormatFns.contains(word))
            translateFormatCall(word, sql, k) match {
              case Left(reason) => throw new IllegalArgumentException(
                s"unsupported DuckDB function $word call: $reason")
              case Right(_) => // translatable — convert pass handles it
            }
          if (k < n && sql.charAt(k) == '(' && DuckStructFns.contains(word))
            translateStructCall(word, sql, k) match {
              case Left(reason) => throw new IllegalArgumentException(
                s"unsupported DuckDB function $word call: $reason")
              case Right(_) => // translatable — convert pass handles it
            }
          i = j
        } else i += 1
      }
    }
  }

  /** DuckDB's literal-delimiter split family: `split` in Spark takes a
    * REGEX, so the delimiter needs quoting, not just a rename.
    */
  private val DuckSplitNames = Set("string_split", "str_split", "string_to_array")

  /** Rewrite 4: DuckDB-dialect pre-pass. The reference's declared contract
    * is "any read-only DuckDB SELECT" (backend/main.py:95-100) and its own
    * canonical demo query uses it — `UNNEST(string_split(genres, ','))`
    * (backend/main.py:767) — so real cloudfloe SQL must run verbatim.
    * Token-level: renames apply only to function-call positions (name
    * immediately followed by `(`) OUTSIDE string literals, quoted
    * identifiers, and comments, so data literals like `WHERE x = 'len(a)'`
    * are never corrupted. `string_split(x, d)` becomes `split(x, <quoted
    * d>)`: a literal delimiter is regex-escaped at rewrite time; a computed
    * one is wrapped in the `\Q…\E` construction `java.util.regex.Pattern
    * .quote` uses (including its embedded-`\E` splice), evaluated at
    * runtime.
    */
  def convertDuckDbDialect(sql: String): String = {
    // java.lang.StringBuilder for its (CharSequence, start, end) append —
    // the Scala wrapper lacks that overload and would box a tuple.
    val out = new java.lang.StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val j = skipQuoted(sql, i)
        out.append(sql, i, j); i = j
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val j = sql.indexOf('\n', i) match { case -1 => n; case k => k }
        out.append(sql, i, j); i = j
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val j = sql.indexOf("*/", i + 2) match { case -1 => n; case k => k + 2 }
        out.append(sql, i, j); i = j
      } else if (isWordChar(c) && !c.isDigit &&
          (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        var j = i
        while (j < n && isWordChar(sql.charAt(j))) j += 1
        val word = sql.substring(i, j).toLowerCase(java.util.Locale.ROOT)
        // A rename fires only on a CALL: next non-space char is `(`.
        var k = j
        while (k < n && sql.charAt(k).isWhitespace) k += 1
        val isCall = k < n && sql.charAt(k) == '('
        if (isCall && DuckFormatFns.contains(word)) {
          translateFormatCall(word, sql, k) match {
            case Right((replacement, close)) =>
              out.append(replacement); i = close + 1
            case Left(_) => // untranslatable — reject pass gives the 400
              out.append(sql, i, j); i = j
          }
        } else if (isCall && DuckStructFns.contains(word)) {
          translateStructCall(word, sql, k) match {
            case Right((replacement, close)) =>
              out.append(replacement); i = close + 1
            case Left(_) => // untranslatable — reject pass gives the 400
              out.append(sql, i, j); i = j
          }
        } else if (isCall && DuckSplitNames.contains(word)) {
          splitArgs(sql, k) match {
            case Some((args, close)) if args.length == 2 =>
              out.append("split(")
                .append(convertDuckDbDialect(args.head.trim)).append(", ")
                .append(quoteDelimiter(args(1).trim)).append(')')
              i = close + 1
            case _ => // wrong arity — leave it to fail loudly at analysis
              out.append(sql, i, j); i = j
          }
        } else if (isCall && DuckRenames.contains(word)) {
          out.append(DuckRenames(word)); i = j
        } else {
          out.append(sql, i, j); i = j
        }
      } else {
        out.append(c); i += 1
      }
    }
    convertSlices(out.toString)
  }

  /** DuckDB's bracket-slice syntax `x[i:j]` (1-based, inclusive bounds;
    * open ends `x[i:]` / `x[:j]` supported) is not Spark syntax at all, so
    * rewriting it is always strictly an improvement. Only LITERAL integer
    * bounds over a plain (possibly dotted) identifier are rewritten —
    * computed bounds like `v[(s*4+1):(s*4+4)]` pass through untouched and
    * fail at analysis rather than risk a silent mis-parse. The target is
    * `duck_slice` (graft.functions.DuckSlice), which dispatches to array
    * `slice` or string `substring` on the resolved type; an open upper
    * bound is encoded as to=Int.MaxValue, which DuckSlice clamps.
    */
  private val SliceRe: Regex =
    """([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)\s*\[\s*(\d*)\s*:\s*(\d*)\s*\]""".r

  private def convertSlices(sql: String): String =
    replaceOutsideLiterals(SliceRe, sql)(m => {
      val (base, lo, hi) = (m.group(1), m.group(2), m.group(3))
      if (lo.isEmpty && hi.isEmpty) Regex.quoteReplacement(m.matched)
      else {
        val from = if (lo.isEmpty) "1" else lo
        val to = if (hi.isEmpty) Int.MaxValue.toString else hi
        Regex.quoteReplacement(s"duck_slice($base, $from, $to)")
      }
    })

  /** From an opening quote at `start`, index just past the closing quote;
    * handles `''` doubling and backslash escapes (Spark literals process
    * both).
    *
    * KNOWN DIVERGENCE: DuckDB standard literals do NOT process backslash
    * escapes, so a DuckDB literal ending in a lone backslash (`'...\'`)
    * tokenizes differently here — the rewriter (like Spark's own parser,
    * which applies the same escape rules downstream) reads the `\'` as an
    * escaped quote and the literal as unterminated. Such a statement would
    * fail Spark analysis regardless of what this pre-pass does, so the
    * divergence cannot corrupt an otherwise-runnable query; writing the
    * backslash as `'...\\'` (valid in both dialects) avoids it.
    */
  private def skipQuoted(s: String, start: Int): Int = {
    val q = s.charAt(start)
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) i += 2
      else if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Top-level comma split of the balanced argument list whose `(` sits at
    * `open`; returns (args, index of the closing paren), or None when
    * unbalanced.
    */
  private def splitArgs(s: String, open: Int): Option[(Seq[String], Int)] = {
    val args = Seq.newBuilder[String]
    var depth = 1
    var i = open + 1
    var argStart = i
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' => i = skipQuoted(s, i)
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) { args += s.substring(argStart, i); return Some((args.result(), i)) }
          i += 1
        case ',' if depth == 1 => args += s.substring(argStart, i); i += 1; argStart = i
        case _ => i += 1
      }
    }
    None
  }

  private val SimpleLiteralRe = """^'((?:[^'\\]|''|\\.)*)'$""".r

  /** Emit a Spark regex-string for a DuckDB LITERAL delimiter: unescape the
    * DuckDB literal (`''` doubling; backslash passes through — DuckDB
    * standard literals don't process escapes), regex-escape each metachar,
    * then re-escape for Spark's literal processing (backslashes doubled,
    * quotes doubled). A non-literal delimiter gets the runtime
    * Pattern.quote construction instead.
    */
  private def quoteDelimiter(arg: String): String = arg match {
    case SimpleLiteralRe(body) =>
      val value = body.replace("''", "'")
      val regex = value.flatMap(c =>
        if ("\\^$.|?*+()[]{}".indexOf(c) >= 0) s"\\$c" else c.toString)
      "'" + regex.replace("\\", "\\\\").replace("'", "''") + "'"
    case expr =>
      // Pattern.quote(expr): \Q expr \E with any embedded \E spliced as
      // \E\\E\Q — correct for every runtime value.
      s"concat('\\\\Q', replace(${convertDuckDbDialect(expr)}, '\\\\E', '\\\\E\\\\\\\\E\\\\Q'), '\\\\E')"
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
