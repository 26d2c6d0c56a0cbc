package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted metadata for one media payload. */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    fingerprint: String)

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata extracted per partition.
  *
  * The decode step is a STUB — image/audio codec libraries are not in this
  * container — replaced by a deterministic fake that derives "decoded"
  * dimensions from the payload bytes. The Spark-side plumbing is real:
  * binary column in, `mapPartitions` over a typed Dataset (one decoder
  * instance per partition, streaming iterator — the same batch shape a JNI
  * or subprocess decoder needs), typed case-class schema out, no shuffle.
  */
object Multimodal {

  /** STUB decoder: a real implementation would parse the image header and
    * pixel data here. Deterministic so tests and oracles can reproduce it.
    */
  def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length
    MediaMeta(
      doc_id = id,
      byte_len = len.toLong,
      width = len % 640 + 1,
      height = len % 480 + 1,
      channels = 3,
      fingerprint = md5Hex(payload))
  }

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** (id binary) -> MediaMeta rows. Per-partition iteration keeps decoder
    * setup cost amortized across a partition's rows and memory bounded to
    * one payload at a time.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // One decoder context per partition would be initialized here.
        it.map { case (id, payload) => decodeStub(id, payload) }
      }
      .toDF()
  }

  /** Demo source: documents' text bytes standing in for media payloads. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  final case class FrameMeta(
      doc_id: Long, frame_idx: Int, frame_w: Int, frame_h: Int, frame_fp: String)

  /** Frame sampling: every `step`-th frame of each "video" payload, with a
    * per-frame fingerprint and resized dimensions. The frame count/decode
    * is the deterministic stub (a real decoder would demux here); the
    * plumbing is the real shape — per-partition decode, one output row per
    * sampled frame, no shuffle (map-side explode).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, step: Int = 5): DataFrame = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val meta = decodeStub(id, payload)
        val nFrames = (payload.length % 30) + 1
        (0 until nFrames by step).map { i =>
          FrameMeta(
            doc_id = id,
            frame_idx = i,
            frame_w = meta.width / 2 + 1, // stub "resize"
            frame_h = meta.height / 2 + 1,
            frame_fp = md5Hex((new String(payload, "UTF-8") + "#" + i).getBytes("UTF-8")))
        }
      }
      .toDF()
  }
}
