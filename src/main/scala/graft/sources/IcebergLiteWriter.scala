package graft.sources

import java.util.UUID

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Writes a DataFrame as a minimal Iceberg-v2-shaped table (metadata JSON +
  * Avro manifest list + Avro manifest + parquet data files) so the probe /
  * delete-guard / iceberg_scan paths can be exercised end-to-end without an
  * Iceberg runtime — the Spark-side analog of the reference's demo seeding
  * script (/root/reference/scripts/upload_sample_data.py). Field names
  * follow the public Iceberg table spec; this writer emits only the subset
  * of fields the IcebergLite reader (and the probe contract) consumes.
  */
object IcebergLiteWriter {

  private val ManifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"content","type":"int","default":0},
      |  {"name":"added_snapshot_id","type":"long"}
      |]}""".stripMargin)

  private val ManifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"],"default":null},
      |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |    {"name":"content","type":"int","default":0},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"}
      |  ]}}
      |]}""".stripMargin)

  private def writeAvro(conf: Configuration, p: Path, schema: Schema,
      records: Seq[GenericRecord]): Long = {
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, out)
    records.foreach(writer.append)
    writer.close()
    fs.getFileStatus(p).getLen
  }

  /** Write `df` as an Iceberg-lite table rooted at `tableDir`. When
    * `withDeleteManifest` is set, an extra position-delete manifest is
    * added so the delete-guard path can be tested.
    */
  def write(spark: SparkSession, df: DataFrame, tableDir: String,
      withDeleteManifest: Boolean = false): Unit =
    commit(spark, df, tableDir, SaveMode.Overwrite, withDeleteManifest)

  /** Append `df` as a new snapshot: new data files + a new manifest, with
    * the previous snapshot's manifests carried forward and its entry kept
    * in the snapshot log — so time travel to the prior snapshot id works.
    */
  def append(spark: SparkSession, df: DataFrame, tableDir: String): Unit =
    commit(spark, df, tableDir, SaveMode.Append, withDeleteManifest = false)

  private def commit(spark: SparkSession, df: DataFrame, tableDir: String,
      mode: SaveMode, withDeleteManifest: Boolean): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = s"$tableDir/data"

    // For appends: carry forward prior manifests + snapshot log, and only
    // manifest the data files the prior snapshot does not already track.
    val prior = if (mode == SaveMode.Append)
      IcebergLite.latestMetadataPath(conf, tableDir)
        .map(p => IcebergLite.readMetadataJson(conf, p))
    else None
    val priorManifests = prior.toSeq.flatMap(m =>
      IcebergLite.currentManifests(conf, tableDir, m))
    val priorFiles = prior.toSeq
      .flatMap(_ => IcebergLite.fileEntries(conf, tableDir)).map(_.path).toSet

    df.write.mode(mode).parquet(dataDir)

    val dataPath = new Path(dataDir)
    val fs = dataPath.getFileSystem(conf)
    val dataFiles = fs.listStatus(dataPath).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .filter(s => !priorFiles.contains(s.getPath.toString))

    val entries = dataFiles.map { s =>
      val rc = spark.read.parquet(s.getPath.toString).count()
      val dataFile = new GenericData.Record(
        ManifestEntrySchema.getField("data_file").schema())
      dataFile.put("content", 0)
      dataFile.put("file_path", s.getPath.toString)
      dataFile.put("file_format", "PARQUET")
      dataFile.put("record_count", rc)
      dataFile.put("file_size_in_bytes", s.getLen)
      val entry = new GenericData.Record(ManifestEntrySchema)
      entry.put("status", 1) // ADDED
      entry.put("snapshot_id", null)
      entry.put("data_file", dataFile)
      entry: GenericRecord
    }

    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)
    val metaDir = s"$tableDir/metadata"
    val manifestPath = new Path(s"$metaDir/manifest-$snapshotId-m0.avro")
    val manifestLen = writeAvro(conf, manifestPath, ManifestEntrySchema, entries)

    val carried = priorManifests.map { m =>
      val p = new Path(m.path)
      manifestFileRecord(m.path, p.getFileSystem(conf).getFileStatus(p).getLen,
        m.content, snapshotId)
    }
    var manifestRecords =
      carried :+ manifestFileRecord(manifestPath.toString, manifestLen, 0, snapshotId)

    if (withDeleteManifest) {
      // A position-delete manifest (content=1) referencing one delete file —
      // enough metadata for hasDeletes to trip, as it would on a real
      // merge-on-read table.
      val delFile = new GenericData.Record(ManifestEntrySchema.getField("data_file").schema())
      delFile.put("content", 1)
      delFile.put("file_path", s"$tableDir/data/delete-00000.parquet")
      delFile.put("file_format", "PARQUET")
      delFile.put("record_count", 1L)
      delFile.put("file_size_in_bytes", 0L)
      val delEntry = new GenericData.Record(ManifestEntrySchema)
      delEntry.put("status", 1)
      delEntry.put("snapshot_id", null)
      delEntry.put("data_file", delFile)
      val delManifestPath = new Path(s"$metaDir/manifest-$snapshotId-m1.avro")
      val delLen = writeAvro(conf, delManifestPath, ManifestEntrySchema, Seq(delEntry))
      manifestRecords :+= manifestFileRecord(delManifestPath.toString, delLen, 1, snapshotId)
    }

    val manifestListPath = new Path(s"$metaDir/snap-$snapshotId-1.avro")
    writeAvro(conf, manifestListPath, ManifestFileSchema, manifestRecords)

    val nowMs = System.currentTimeMillis()
    val newSnapshot =
      s"""{
         |      "snapshot-id": $snapshotId,
         |      "timestamp-ms": $nowMs,
         |      "manifest-list": "$manifestListPath",
         |      "summary": {"operation": "append"}
         |    }""".stripMargin
    val priorSnapshots = prior.toSeq.flatMap(_.get("snapshots")).flatMap {
      case graft.gateway.JValue.JArr(items) => items.map(graft.gateway.Json.render)
      case _ => Nil
    }
    val snapshotsJson = (priorSnapshots :+ newSnapshot).mkString(",\n    ")
    val metadataJson =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "${UUID.randomUUID()}",
         |  "location": "$tableDir",
         |  "last-updated-ms": $nowMs,
         |  "current-snapshot-id": $snapshotId,
         |  "snapshots": [
         |    $snapshotsJson
         |  ]
         |}""".stripMargin
    val metaDirPath = new Path(metaDir)
    val metaFs = metaDirPath.getFileSystem(conf)
    val version =
      if (!metaFs.exists(metaDirPath)) 0
      else metaFs.listStatus(metaDirPath)
        .count(_.getPath.getName.endsWith(".metadata.json"))
    val metaJsonPath = new Path(f"$metaDir/$version%05d-${UUID.randomUUID()}.metadata.json")
    val out = metaJsonPath.getFileSystem(conf).create(metaJsonPath, true)
    out.write(metadataJson.getBytes("UTF-8"))
    out.close()
  }

  private def manifestFileRecord(path: String, len: Long, content: Int,
      snapshotId: Long): GenericRecord = {
    val r = new GenericData.Record(ManifestFileSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", len)
    r.put("partition_spec_id", 0)
    r.put("content", content)
    r.put("added_snapshot_id", snapshotId)
    r
  }
}
