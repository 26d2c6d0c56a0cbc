package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.util.{Failure, Success, Try}

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gateway.{JValue, Json}
import graft.gateway.JValue.{JNum, JObj, JStr}

/** Table metadata descriptor (the reference's `TableInfo`,
  * /root/reference/backend/main.py:244-259). Snapshot ids are stringified
  * at this edge — they are 64-bit and would lose precision in JS
  * (main.py:489-490).
  */
final case class TableInfo(
    path: String,
    suggestedQuery: String,
    format: Option[String] = None,
    rows: Option[Long] = None,
    files: Option[Long] = None,
    hasDeletes: Option[Boolean] = None,
    snapshotId: Option[String] = None,
    lastSnapshotAt: Option[String] = None)

/** Minimal catalog-less Iceberg table reader built on the public Iceberg
  * table spec (iceberg.apache.org/spec): latest metadata JSON file under
  * the table's metadata dir -> current snapshot -> manifest list (Avro) ->
  * manifests (Avro) -> data file paths, scanned with Spark's vectorized
  * parquet reader.
  *
  * This is the engine's `iceberg_scan(path)` backend (the reference
  * delegates to DuckDB's iceberg extension; no Iceberg Spark runtime jar
  * ships in this build, so the metadata chain is read directly). Avro
  * records are decoded against each file's embedded writer schema and
  * fields accessed by spec name, so both this engine's fixture writer and
  * real Iceberg writers are readable.
  *
  * Scale note: metadata-chain reads are driver-side and proportional to
  * manifest count, not data size; the data scan itself is a standard
  * distributed parquet scan with pushdown/pruning intact.
  */
object IcebergLite {

  final case class ManifestInfo(path: String, content: Int)
  final case class FileEntry(
      path: String, fileContent: Int, recordCount: Long, status: Int, manifestContent: Int)

  final case class ProbeError(message: String) extends RuntimeException(message)

  private def fs(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  /** Latest metadata JSON by filename order — correct for both pyiceberg's
    * `NNNNN-<uuid>.metadata.json` and Spark's `vN.metadata.json` naming
    * (the reference pins the same trick, main.py:477-480).
    */
  def latestMetadataPath(conf: Configuration, tablePath: String): Option[Path] = {
    val glob = new Path(s"$tablePath/metadata/*.metadata.json")
    val statuses = Try(fs(glob, conf).globStatus(glob)).toOption
      .flatMap(Option(_)).getOrElse(Array.empty)
    statuses.map(_.getPath).sortBy(_.getName).lastOption
  }

  def readMetadataJson(conf: Configuration, p: Path): JObj = {
    val in = fs(p, conf).open(p)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      Json.parse(new String(bytes, "UTF-8")) match {
        case o: JObj => o
        case _ => throw ProbeError(s"Metadata JSON at $p is not an object")
      }
    } finally in.close()
  }

  private def jLong(o: JObj, key: String): Option[Long] =
    o.get(key).collect { case JNum(n) => n.toLong }

  /** Read every record of an Avro container file using its writer schema. */
  private def readAvro(conf: Configuration, p: Path): Seq[GenericRecord] = {
    val in = fs(p, conf).open(p)
    try {
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val out = ArrayBuffer.empty[GenericRecord]
      while (stream.hasNext) out += stream.next()
      stream.close()
      out.toSeq
    } finally Try(in.close())
  }

  private def fieldLong(r: GenericRecord, name: String, default: Long = 0L): Long =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name))) match {
      case Some(v: Number) => v.longValue()
      case _ => default
    }

  private def fieldStr(r: GenericRecord, name: String): Option[String] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name))).map(_.toString)

  /** Manifest list of the selected snapshot (default: current). The
    * `snapshotId` override is the time-travel entry point — the analog of
    * `VERSION AS OF` (the reference documents "time travel via snapshots"
    * as part of its capability surface, reference README.md:197).
    */
  def currentManifests(conf: Configuration, tablePath: String, meta: JObj,
      snapshotId: Option[Long] = None): Seq[ManifestInfo] = {
    val snapId = snapshotId.orElse(jLong(meta, "current-snapshot-id"))
      .getOrElse(throw ProbeError("metadata has no current-snapshot-id"))
    val snapshots = meta.get("snapshots") match {
      case Some(JValue.JArr(items)) => items.collect { case o: JObj => o }
      case _ => Vector.empty
    }
    val snap = snapshots.find(s => jLong(s, "snapshot-id").contains(snapId))
      .getOrElse(throw ProbeError(s"snapshot $snapId not found in metadata"))
    val mlPath = snap.str("manifest-list")
      .getOrElse(throw ProbeError("snapshot has no manifest-list"))
    readAvro(conf, new Path(mlPath)).map { r =>
      ManifestInfo(
        path = fieldStr(r, "manifest_path").getOrElse(
          throw ProbeError("manifest list entry missing manifest_path")),
        content = fieldLong(r, "content", 0L).toInt)
    }
  }

  /** All live file entries of the selected snapshot (status 2 = deleted
    * entries are dropped, matching an Iceberg planner's view).
    */
  def fileEntries(conf: Configuration, tablePath: String,
      snapshotId: Option[Long] = None): Seq[FileEntry] = {
    val metaPath = latestMetadataPath(conf, tablePath)
      .getOrElse(throw ProbeError(s"No Iceberg metadata readable at $tablePath"))
    val meta = readMetadataJson(conf, metaPath)
    currentManifests(conf, tablePath, meta, snapshotId).flatMap { m =>
      readAvro(conf, new Path(m.path)).flatMap { entry =>
        val status = fieldLong(entry, "status", 1L).toInt
        Option(entry.get("data_file")).collect { case df: GenericRecord =>
          FileEntry(
            path = fieldStr(df, "file_path").getOrElse(
              throw ProbeError("manifest entry missing file_path")),
            fileContent = fieldLong(df, "content", 0L).toInt,
            recordCount = fieldLong(df, "record_count", 0L),
            status = status,
            manifestContent = m.content)
        }
      }.filter(_.status != 2)
    }
  }

  /** Scan the table's current snapshot as a DataFrame. Delete files are NOT
    * applied — callers must run [[assertNoDeletes]] first (the engine
    * rejects tables with row-level deletes rather than silently returning
    * removed rows, matching the reference's guard, main.py:391-423).
    */
  def scan(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dataFiles = fileEntries(conf, tablePath, snapshotId)
      .filter(e => e.manifestContent == 0 && e.fileContent == 0)
      .map(_.path)
    if (dataFiles.isEmpty)
      throw ProbeError(s"No data files in Iceberg table at $tablePath")
    spark.read.parquet(dataFiles: _*)
  }

  /** The `iceberg_metadata('path')` relation (the reference probes it at
    * main.py:503-512): one row per live file entry with its manifest
    * context — enough surface for the reference's documented
    * SUM(record_count) / COUNT(*) / delete-detection queries.
    */
  def metadataRelation(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    fileEntries(conf, tablePath)
      .map(e => (
        e.path,
        if (e.manifestContent == 0) "DATA" else "DELETE",
        e.recordCount,
        if (e.fileContent == 0) "DATA"
        else if (e.fileContent == 1) "POSITION_DELETES"
        else "EQUALITY_DELETES",
        e.status.toLong))
      .toDF("file_path", "manifest_content", "record_count", "content", "status")
  }

  /** The `iceberg_snapshots('path')` relation (documented surface,
    * reference README.md:127-131): the table's snapshot log.
    */
  def snapshotsRelation(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val metaPath = latestMetadataPath(conf, tablePath)
      .getOrElse(throw ProbeError(s"No Iceberg metadata readable at $tablePath"))
    val meta = readMetadataJson(conf, metaPath)
    val current = jLong(meta, "current-snapshot-id")
    val snaps = meta.get("snapshots") match {
      case Some(JValue.JArr(items)) => items.collect { case o: JObj => o }
      case _ => Vector.empty
    }
    snaps.map { s =>
      val id = jLong(s, "snapshot-id").getOrElse(0L)
      (id,
        jLong(s, "timestamp-ms").map(ms => new java.sql.Timestamp(ms)).orNull,
        s.str("manifest-list").getOrElse(""),
        current.contains(id))
    }.toDF("snapshot_id", "committed_at", "manifest_list", "is_current")
  }

  /** True when the current snapshot carries any delete manifest/file. */
  def hasDeletes(conf: Configuration, tablePath: String): Boolean = {
    val metaPath = latestMetadataPath(conf, tablePath)
      .getOrElse(throw ProbeError(s"No Iceberg metadata readable at $tablePath"))
    val meta = readMetadataJson(conf, metaPath)
    currentManifests(conf, tablePath, meta).exists(_.content != 0)
  }

  final case class DeleteGuardError(message: String) extends RuntimeException(message)

  /** Delete-guard (reference main.py:391-423): block queries over tables
    * with row-level deletes; a probe *failure* degrades to a warning
    * rather than blocking (main.py:421-423).
    */
  def assertNoDeletes(spark: SparkSession, tablePath: String): Unit =
    Try(hasDeletes(spark.sparkContext.hadoopConfiguration, tablePath)) match {
      case Success(true) =>
        throw DeleteGuardError(
          "Table has row-level deletes (position or equality). Reads would " +
            "return rows the Iceberg metadata has marked removed, so the " +
            "query is blocked rather than silently wrong. Compact the table " +
            "first, then retry.")
      case Success(false) => ()
      case Failure(_) => () // degraded: cannot validate -> proceed with caution
    }

  /** Connection-probe metadata (reference `_probe_iceberg_table`,
    * main.py:452-526): the metadata-JSON sub-probe and the manifest
    * aggregate sub-probe degrade independently; both failing is an error.
    */
  def probe(spark: SparkSession, tablePath: String): TableInfo = {
    val conf = spark.sparkContext.hadoopConfiguration
    var info = TableInfo(
      path = tablePath,
      suggestedQuery = s"SELECT * FROM iceberg_scan('$tablePath') LIMIT 10")
    var jsonOk = false
    var manifestOk = false

    val metaOpt = Try(latestMetadataPath(conf, tablePath)).toOption.flatten
      .flatMap(p => Try(readMetadataJson(conf, p)).toOption)
    metaOpt.foreach { meta =>
      jsonOk = true
      info = info.copy(
        format = jLong(meta, "format-version").map(v => s"iceberg-v$v"),
        snapshotId = jLong(meta, "current-snapshot-id").map(_.toString),
        lastSnapshotAt = jLong(meta, "last-updated-ms").map(ms =>
          java.time.Instant.ofEpochMilli(ms).toString))
    }

    Try(fileEntries(conf, tablePath)) match {
      case Success(entries) =>
        manifestOk = true
        info = info.copy(
          rows = Some(entries.filter(_.manifestContent == 0).map(_.recordCount).sum),
          files = Some(entries.length.toLong),
          hasDeletes = Some(entries.exists(_.manifestContent != 0)))
      case Failure(_) => ()
    }

    if (!jsonOk && !manifestOk)
      throw ProbeError(
        s"No Iceberg metadata readable at $tablePath — path may be wrong or credentials may lack access")
    info
  }
}
