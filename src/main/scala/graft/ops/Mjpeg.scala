package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MJPEG-in-AVI: REAL compressed-frame video decode, offline.
  *
  * The multimodal family's one declared stub has been compressed-codec
  * frame decode (container walks and uncompressed y4m/WAV/PNG decode are
  * real — `MediaHeaders`). This closes it for the oldest codec still in
  * production use: Motion-JPEG carried in a RIFF/AVI container (the
  * classic capture format; every frame is an independent baseline JPEG).
  * Everything here is the actual format, parsed from the actual bytes:
  *
  *   - the AVI side is a real RIFF walk — `RIFF('AVI ')`, the `hdrl`
  *     LIST's `avih` main header (width/height/frame count), and the
  *     `movi` LIST's `00dc` compressed-frame chunks (even-byte padded,
  *     exactly as the spec lays them out);
  *   - the JPEG side is a real baseline decoder: marker walk (DQT, SOF0,
  *     DHT, SOS), canonical Huffman table construction from the DHT bit
  *     counts, an entropy reader that honors 0xFF00 byte stuffing, DC
  *     difference decoding with magnitude extension, dequantization
  *     against the stream's own quant table, and the full 64-term
  *     2D IDCT with level shift and clamping per block.
  *
  * The SYNTHESIZED streams keep the oracle arithmetic exact the same way
  * p101/p102/p117 do for WAV/PNG/y4m: frames are grayscale JPEGs whose
  * blocks are flat (AC all zero — the encoder emits real Huffman-coded
  * DC categories + EOB), DC values are multiples of 64 against an
  * all-ones quant table, so the IDCT lands on integers (pixel =
  * 128 + dc/8 exactly) and an independent engine can state every
  * frame's luma statistics in closed form. The DECODER never assumes
  * any of this — it runs the general entropy/IDCT path and would decode
  * any single-component baseline JPEG without restart markers (DRI/RSTn
  * are unsupported). As of r16 both decoders share ONE header parse
  * (`parseJpegHeader`) that walks every packed DQT/DHT table and honors
  * the stream's per-component selectors (SOF Tq, SOS Td/Ta) — the
  * earlier "scan must reference quant table 0" gray restriction fell
  * out in the unification. The COLOR path is real too:
  * [[decodeJpegColorStats]] decodes three-component YCbCr 4:2:0
  * interleaved scans (the layout camera MJPEG emits) with per-component
  * quant/Huffman selection from the stream — the r15 "luma-only"
  * restriction is closed; DRI/RSTn remain the declared gap.
  *
  * Scale/plumbing shape: per-partition iteration over the typed binary
  * column (the subprocess-decoder batch shape), one row per frame, no
  * shuffle at any corpus size. Malformed containers or frames yield the
  * rows decoded before the fault — the audioStats defensive posture.
  */
object Mjpeg {

  // ---- little-endian helpers (RIFF is LE) --------------------------------

  private def le16Bytes(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def le32Bytes(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), "US-ASCII")

  // ---- JPEG encoder (baseline, grayscale, DC-only blocks) ----------------

  /** Annex-K luminance Huffman tables (written into the stream's DHT and
    * re-read by the decoder — the decoder trusts only the stream).
    */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** (symbol → (codeLength, code)) per the canonical JPEG assignment:
    * codes of each length are consecutive, starting from double the
    * previous length's end.
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = bits(len - 1)
      while (n > 0) {
        out += ((vals(k) & 0xff) -> (len, code))
        code += 1; k += 1; n -= 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val dcEnc = canonicalCodes(DcBits, DcVals)
  private lazy val acEnc = canonicalCodes(AcBits, AcVals)

  /** MSB-first bit writer with JPEG 0xFF00 byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits, per the spec. */
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  /** One grayscale baseline JPEG whose blocks are flat: block b of frame
    * `f` has pixel value 128 + 8 * kOf(b) with kOf in [-8, 8] — DC
    * coefficient 64 * kOf(b) against the all-ones quant table, AC all
    * zero. Real markers, real Huffman entropy coding, real byte
    * stuffing; width/height must be multiples of 8 (the synth geometry
    * always is).
    */
  private[ops] def synthJpegFlatBlocks(width: Int, height: Int,
      kOf: Int => Int): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0 && width > 0 && height > 0,
      "synth geometry must be positive multiples of 8")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb, Array[Byte](0) ++ Array.fill(64)(1.toByte)) // DQT all ones
    marker(0xc0, Array[Byte](8, // SOF0: precision
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0)) // 1 component, no subsampling, quant table 0
    marker(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals)
    marker(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals)
    marker(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    val bw = new BitWriter(out)
    val (eobLen, eobCode) = acEnc(0x00)
    var prevDc = 0
    val nBlocks = (width / 8) * (height / 8)
    var b = 0
    while (b < nBlocks) {
      val dc = 64 * kOf(b)
      var diff = dc - prevDc
      prevDc = dc
      var mag = math.abs(diff)
      var size = 0
      while (mag > 0) { size += 1; mag >>= 1 }
      val (cl, cc) = dcEnc(size)
      bw.put(cc, cl)
      if (size > 0) {
        if (diff < 0) diff += (1 << size) - 1
        bw.put(diff & ((1 << size) - 1), size)
      }
      bw.put(eobCode, eobLen) // all AC zero
      b += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---- AVI container ------------------------------------------------------

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32Bytes(data.length) ++ data ++ pad
  }

  private def list(tpe: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ data)

  /** Genuine RIFF/AVI bytes: `hdrl` (avih main header + one `vids`/MJPG
    * stream), then `movi` with one real baseline JPEG per `00dc` chunk.
    * Frame f's block b carries k = ((id*31 + f*17 + b*7) mod 17) - 8,
    * the deterministic formula the oracle restates.
    */
  def synthMjpegAvi(id: Long, width: Int, height: Int, frames: Int): Array[Byte] =
    aviContainer(width, height, frames, f =>
      synthJpegFlatBlocks(width, height,
        b => (((id * 31 + f * 17 + b * 7) % 17) - 8).toInt))

  /** RIFF/AVI wrapper shared by the gray and color synthesizers: hdrl
    * (avih + one vids/MJPG stream) + movi with one `00dc` chunk per
    * frame from `frameBytes`.
    */
  private def aviContainer(width: Int, height: Int, frames: Int,
      frameBytes: Int => Array[Byte]): Array[Byte] = {
    val avih = chunk("avih",
      le32Bytes(33333) ++ le32Bytes(0) ++ le32Bytes(0) ++ le32Bytes(0x10) ++
        le32Bytes(frames) ++ le32Bytes(0) ++ le32Bytes(1) ++ le32Bytes(0) ++
        le32Bytes(width) ++ le32Bytes(height) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        Array.fill(12)(0.toByte) ++ le32Bytes(1) ++ le32Bytes(30) ++
        le32Bytes(0) ++ le32Bytes(frames) ++ Array.fill(16)(0.toByte))
    val strf = chunk("strf",
      le32Bytes(40) ++ le32Bytes(width) ++ le32Bytes(height) ++
        le16Bytes(1) ++ le16Bytes(24) ++ "MJPG".getBytes("US-ASCII") ++
        le32Bytes(width * height * 3) ++ Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      (0 until frames).toArray.flatMap(f => chunk("00dc", frameBytes(f))))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32Bytes(body.length) ++ body
  }

  /** Demo MJPEG/AVI source over `documents`: w ∈ {8,16,24}, h ∈ {8,16},
    * 1–5 frames, block luma from the deterministic formula above.
    */
  def synthesizeAviVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // Spread the ids BEFORE synthesizing/decoding: the demo source
    // inherits the documents scan's split count, and the fixture
    // parquet is single row-group (= one split), which would serialize
    // the whole encode+decode chain onto one core. Real media arrives
    // as many files/splits; an id shuffle (longs only — the payloads
    // are synthesized after the exchange) restores that shape here.
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => (id, synthMjpegAvi(id, ((id % 3 + 1) * 8).toInt,
        ((id % 2 + 1) * 8).toInt, (id % 5 + 1).toInt)))
      .toDF("doc_id", "payload")
  }

  // ---- JPEG decoder (baseline, single component) --------------------------

  /** Canonical decode table: (firstCodeOfLen, firstIndexOfLen) per length
    * plus the symbol array — the standard O(1)-per-bit-length lookup.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        } else maxCode(len) = -1
        code <<= 1
      }
    }
    def symbol(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** MSB-first bit reader over the entropy segment with 0xFF00
    * unstuffing; returns -1 past the segment (callers fail the frame).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) return -1
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length || b(pos) != 0x00) return -1 // a marker: stop
          pos += 1
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return -1
        v = (v << 1) | x; i += 1
      }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x; len += 1
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len) &&
          code >= t.minCode(len)) return t.symbol(len, code)
      }
      -1
    }
  }

  /** JPEG zig-zag order: zigzag(k) = raster index of the k-th scanned
    * coefficient.
    */
  private val ZigZag: Array[Int] = {
    val z = new Array[Int](64)
    var x = 0; var y = 0
    var up = true
    for (k <- 0 until 64) {
      z(k) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  /** cos((2x+1)uπ/16) via StrictMath so decode is bit-identical on any
    * JVM/platform.
    */
  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16)
    t
  }

  /** Decoded frame: width, height, and per-block 8×8 pixel arrays are
    * reduced directly to (sum, min, max) — frames are decoded for their
    * statistics, the p101/p117 card contract.
    */
  /** Parsed baseline-JPEG header state: geometry, the 8-bit quant
    * tables (Tq 0/1), the four Huffman slots (Tc x Th 0/1), per-
    * component SOF ids / sampling / quant selectors and SOS table
    * selectors, and the entropy-segment offset.
    */
  private final class JpegHeader(
      val width: Int, val height: Int, val nf: Int,
      val quant: Array[Array[Int]],
      val dcTabs: Array[HuffTable], val acTabs: Array[HuffTable],
      val compHv: Array[Int], val compTq: Array[Int],
      val compTd: Array[Int], val compTa: Array[Int],
      val scanAt: Int)

  /** Marker/segment walk shared by the gray and color decoders (the r16
    * review's duplication item): SOI check, DQT walk over EVERY packed
    * table (8-bit Tq 0/1 kept, 16-bit skipped by declared width), DHT
    * walk storing all four (Tc, Th <= 1) slots, SOF0 with 1..3
    * components (precision 8), SOS mapping each scan selector back to
    * its SOF component by id. Every branch reads only inside its
    * DECLARED segment [seg, seg + len - 2): a truncated marker (len
    * shorter than the structure it announces) is malformed input and
    * must yield None, never an out-of-bounds read — the whole-job-
    * killing failure a flatMap task exception would be. Callers enforce
    * their component-count/sampling contract and that the tables their
    * components select are present.
    */
  private def parseJpegHeader(b: Array[Byte]): Option[JpegHeader] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    val quant = new Array[Array[Int]](2)
    val dcTabs = new Array[HuffTable](2)
    val acTabs = new Array[HuffTable](2)
    var width = 0
    var height = 0
    var nf = 0
    val compId = new Array[Int](3)
    val compHv = new Array[Int](3)
    val compTq = new Array[Int](3)
    val compTd = new Array[Int](3)
    val compTa = new Array[Int](3)
    var scanAt = -1
    while (scanAt < 0 && i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val seg = i + 4
      if (len < 2 || seg + len - 2 > b.length) return None
      val segEnd = seg + len - 2
      m match {
        case 0xdb =>
          var p = seg
          while (p < segEnd) {
            val pq = (b(p) & 0xf0) >> 4
            val tq = b(p) & 0x0f
            val w = 1 + 64 * (pq + 1)
            if (pq > 1 || p + w > segEnd) return None // malformed/truncated
            if (pq == 0 && tq <= 1)
              quant(tq) = (0 until 64).map(k => b(p + 1 + k) & 0xff).toArray
            p += w
          }
        case 0xc0 =>
          if (len < 8) return None
          height = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
          width = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
          nf = b(seg + 5) & 0xff
          if ((b(seg) & 0xff) != 8 || nf < 1 || nf > 3) return None
          if (len < 8 + 3 * nf) return None
          var c = 0
          while (c < nf) {
            compId(c) = b(seg + 6 + c * 3) & 0xff
            compHv(c) = b(seg + 7 + c * 3) & 0xff
            compTq(c) = b(seg + 8 + c * 3) & 0xff
            if (compTq(c) > 1) return None
            c += 1
          }
        case 0xc4 =>
          var p = seg
          while (p < segEnd) {
            if (p + 17 > segEnd) return None // TcTh + 16 bit counts
            val tc = (b(p) & 0xf0) >> 4
            val th = b(p) & 0x0f
            if (th > 1) return None
            val bits = (0 until 16).map(k => b(p + 1 + k) & 0xff).toArray
            val n = bits.sum
            if (p + 17 + n > segEnd) return None // declared values truncated
            val vals = b.slice(p + 17, p + 17 + n)
            if (tc == 0) dcTabs(th) = new HuffTable(bits, vals)
            else acTabs(th) = new HuffTable(bits, vals)
            p += 17 + n
          }
        case 0xda =>
          val ns = b(seg) & 0xff
          if (ns != nf || nf == 0 || len < 2 + 1 + ns * 2 + 3) return None
          var c = 0
          while (c < ns) {
            val cid = b(seg + 1 + c * 2) & 0xff
            val tdta = b(seg + 2 + c * 2) & 0xff
            var k = 0
            var found = false
            while (k < nf && !found) {
              if (compId(k) == cid) {
                compTd(k) = (tdta & 0xf0) >> 4
                compTa(k) = tdta & 0x0f
                found = true
              }
              k += 1
            }
            if (!found || (tdta & 0xf0) > 0x10 || (tdta & 0x0f) > 1) return None
            c += 1
          }
          scanAt = seg + ns * 2 + 4
        case 0xd9 => return None // EOI before any scan
        case _ => () // APPn/COM etc: skip
      }
      i = if (scanAt < 0) seg + len - 2 else i
    }
    if (scanAt < 0 || width <= 0 || height <= 0) return None
    // Every selected table must exist in the stream.
    var c = 0
    while (c < nf) {
      if (quant(compTq(c)) == null || dcTabs(compTd(c)) == null ||
        acTabs(compTa(c)) == null) return None
      c += 1
    }
    Some(new JpegHeader(width, height, nf, quant, dcTabs, acTabs,
      compHv, compTq, compTd, compTa, scanAt))
  }


  private[ops] def decodeJpegGrayStats(b: Array[Byte]): Option[(Int, Int, Long, Int, Int)] = {
    val h = parseJpegHeader(b) match {
      case Some(x) if x.nf == 1 => x
      case _ => return None
    }
    val width = h.width
    val height = h.height
    val dcTab = h.dcTabs(h.compTd(0))
    val acTab = h.acTabs(h.compTa(0))
    val quant = h.quant(h.compTq(0))
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val rd = new BitReader(b, h.scanAt)
    val blockPix = new Array[Int](64)
    val coefScratch = new Array[Int](64)
    val idctScratch = new Array[Double](64)
    var sum = 0L
    var mn = 255
    var mx = 0
    var prevDc = 0
    var blk = 0
    val nBlocks = bw * bh
    while (blk < nBlocks) {
      // Shared block decoder (entropy + dequant + sparse IDCT + clamp);
      // arithmetic identical to the r14 inline form.
      val nd = decodeBlockStats(rd, dcTab, acTab, quant, prevDc, blockPix,
        coefScratch, idctScratch)
      if (nd == Int.MinValue) return None
      prevDc = nd
      // Reduce the block against the frame geometry (edge blocks of a
      // non-multiple-of-8 image only count their in-bounds pixels).
      val bx = (blk % bw) * 8
      val by = (blk / bw) * 8
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          if (bx + xx < width && by + yy < height) {
            val p = blockPix(yy * 8 + xx)
            sum += p
            if (p < mn) mn = p
            if (p > mx) mx = p
          }
          xx += 1
        }
        yy += 1
      }
      blk += 1
    }
    Some((width, height, sum, mn, mx))
  }

  /** REAL MJPEG frame decode over AVI payloads: RIFF walk to the `movi`
    * LIST, then every `00dc` chunk through the baseline-JPEG decoder.
    * Non-AVI payloads yield no rows; a malformed frame stops the walk
    * but keeps the frames decoded before it. Returns
    * (doc_id, frame_idx, width, height, y_sum, y_min, y_max).
    */
  def aviFrameStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val rows = Seq.newBuilder[(Long, Int, Int, Int, Long, Int, Int)]
        walkMoviFrames(b) { (f, frame) =>
          // The decoder is bounds-checked; the catch is the defensive
          // backstop for any malformed shape it misses — a decode fault
          // must cost THIS payload's remaining frames, never the task.
          val dec =
            try decodeJpegGrayStats(frame)
            catch { case scala.util.control.NonFatal(_) => None }
          dec match {
            case Some((w, h, s, mn, mx)) =>
              rows += ((id, f, w, h, s, mn, mx))
              true
            case None => false
          }
        }
        rows.result()
      }
      .toDF("doc_id", "frame_idx", "width", "height", "y_sum", "y_min", "y_max")
  }

  /** Decode ONE 8x8 block (DC diff + AC runs, dequant, sparse IDCT,
    * level shift, clamp) into `outPix`; returns the new DC predictor,
    * or Int.MinValue on any entropy/structure fault. Shared by the
    * gray and color paths — identical arithmetic to the r14 decoder.
    */
  private def decodeBlockStats(rd: BitReader, dcTab: HuffTable,
      acTab: HuffTable, quant: Array[Int], prevDc: Int,
      outPix: Array[Int], coef: Array[Int], idctAcc: Array[Double]): Int = {
    // Scratch arrays are caller-owned and amortized per FRAME (the r14
    // inline form's shape) — a per-block allocation here would be ~768
    // bytes of garbage per 8x8 block in the decode hot path.
    java.util.Arrays.fill(coef, 0)
    java.util.Arrays.fill(idctAcc, 0.0)
    val s = rd.decode(dcTab)
    if (s < 0) return Int.MinValue
    var diff = 0
    if (s > 0) {
      val v = rd.bits(s); if (v < 0) return Int.MinValue
      diff = if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    val dc = prevDc + diff
    coef(0) = dc * quant(0)
    var k = 1
    var run = true
    while (run && k < 64) {
      val rs = rd.decode(acTab)
      if (rs < 0) return Int.MinValue
      if (rs == 0x00) run = false // EOB
      else if (rs == 0xf0) k += 16 // ZRL
      else {
        k += (rs >> 4)
        val sz = rs & 0x0f
        if (k > 63 || sz == 0) return Int.MinValue
        val v = rd.bits(sz); if (v < 0) return Int.MinValue
        val ac = if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
        coef(ZigZag(k)) = ac * quant(k)
        k += 1
      }
    }
    var ci = 0
    while (ci < 64) {
      val c = coef(ci)
      if (c != 0) {
        val u = ci & 7
        val v = ci >> 3
        val scale = (if (u == 0) 0.7071067811865476 else 1.0) *
          (if (v == 0) 0.7071067811865476 else 1.0) * c
        var y = 0
        while (y < 8) {
          val cy = scale * CosTable(y * 8 + v)
          var x = 0
          while (x < 8) {
            idctAcc(y * 8 + x) += cy * CosTable(x * 8 + u)
            x += 1
          }
          y += 1
        }
      }
      ci += 1
    }
    var pi = 0
    while (pi < 64) {
      val p = StrictMath.round(idctAcc(pi) / 4 + 128).toInt
      outPix(pi) = math.max(0, math.min(255, p))
      pi += 1
    }
    dc
  }

  /** RIFF walk to the movi LIST, invoking `handler(frameIdx, bytes)` per
    * `..dc` chunk; handler returns false to stop (malformed frame —
    * frames decoded before the fault are kept). Shared by the gray and
    * color stat readers; bounds posture identical to the r14 walk.
    */
  private def walkMoviFrames(b: Array[Byte])(
      handler: (Int, Array[Byte]) => Boolean): Unit = {
    if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") {
      val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
      var i = 12
      var movi = -1
      var moviEnd = -1
      while (movi < 0 && i + 8 <= end) {
        val sz = le32(b, i + 4)
        if (sz < 0) { i = end }
        else if (fourcc(b, i) == "LIST" && sz >= 4 && i + 12 <= end &&
          fourcc(b, i + 8) == "movi") {
          movi = i + 12
          moviEnd = math.min(i + 8L + sz, end.toLong).toInt
        } else if (i + 8L + sz > end) { i = end }
        else i += 8 + sz + (sz & 1)
      }
      if (movi >= 0) {
        var p = movi
        var f = 0
        var ok = true
        while (ok && p + 8 <= moviEnd) {
          val cid = fourcc(b, p)
          val sz = le32(b, p + 4)
          if (sz < 0 || p + 8L + sz > moviEnd) ok = false
          else {
            if (cid.endsWith("dc")) {
              if (handler(f, b.slice(p + 8, p + 8 + sz))) f += 1
              else ok = false
            }
            p += 8 + sz + (sz & 1)
          }
        }
      }
    }
  }

  // ---- JPEG encoder (baseline, YCbCr 4:2:0, DC-only blocks) ---------------

  /** One COLOR baseline JPEG (YCbCr, 4:2:0 subsampling — the layout real
    * camera MJPEG emits): three components in one interleaved scan, MCUs
    * of four Y blocks + one Cb + one Cr, TWO quant tables (luma all-ones,
    * chroma all-TWOS — a genuinely different dequant path whose math
    * still lands on integers: chroma DC 32k against quant 2 gives
    * 64k = pixel 128 + 8k), four DHT slots (DC/AC × luma/chroma ids; the
    * chroma slots carry the same Annex-K arrays under their own Th — the
    * decoder must still select tables PER COMPONENT from the stream).
    * Block values: luma block b (MCU scan order) = 128 + 8*kY(b); chroma
    * block c (one per MCU) = 128 + 8*kC(c)._1 / ._2. Geometry must be
    * multiples of 16 (full MCUs).
    */
  private[ops] def synthJpegYcbcr420(width: Int, height: Int,
      kY: Int => Int, kC: Int => (Int, Int)): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0 && width > 0 && height > 0,
      "synth 4:2:0 geometry must be positive multiples of 16")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    // One DQT segment PACKING both tables (exercises the walk-all parse).
    marker(0xdb, Array[Byte](0x00) ++ Array.fill(64)(1.toByte) ++
      Array[Byte](0x01) ++ Array.fill(64)(2.toByte))
    marker(0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, // Nf = 3 components
      1, 0x22, 0, // Y: H=2,V=2, quant 0
      2, 0x11, 1, // Cb: H=1,V=1, quant 1
      3, 0x11, 1)) // Cr
    marker(0xc4, Array[Byte](0x00) ++ DcBits.map(_.toByte) ++ DcVals)
    marker(0xc4, Array[Byte](0x10) ++ AcBits.map(_.toByte) ++ AcVals)
    marker(0xc4, Array[Byte](0x01) ++ DcBits.map(_.toByte) ++ DcVals)
    marker(0xc4, Array[Byte](0x11) ++ AcBits.map(_.toByte) ++ AcVals)
    marker(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val bw = new BitWriter(out)
    val (eobLen, eobCode) = acEnc(0x00)
    def putDc(diff: Int): Unit = {
      var mag = math.abs(diff)
      var size = 0
      while (mag > 0) { size += 1; mag >>= 1 }
      val (cl, cc) = dcEnc(size)
      bw.put(cc, cl)
      if (size > 0) {
        var d = diff
        if (d < 0) d += (1 << size) - 1
        bw.put(d & ((1 << size) - 1), size)
      }
      bw.put(eobCode, eobLen) // flat block: all AC zero
    }
    val mcus = (width / 16) * (height / 16)
    var prevY = 0
    var prevCb = 0
    var prevCr = 0
    var m = 0
    while (m < mcus) {
      var sub = 0
      while (sub < 4) { // four luma blocks per MCU, MCU-scan index
        val dc = 64 * kY(m * 4 + sub)
        putDc(dc - prevY); prevY = dc
        sub += 1
      }
      val (kcb, kcr) = kC(m)
      val cb = 32 * kcb // against quant 2 -> coef 64*k -> pixel 128+8k
      putDc(cb - prevCb); prevCb = cb
      val cr = 32 * kcr
      putDc(cr - prevCr); prevCr = cr
      m += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Genuine RIFF/AVI around YCbCr 4:2:0 MJPEG frames; same container
    * writer as [[synthMjpegAvi]], color payloads. Frame f of stream id:
    * luma block b (MCU order) k = ((id*31 + f*17 + b*7) mod 17) - 8,
    * chroma block c: Cb k = ((id*13 + f*7 + c*5) mod 17) - 8,
    * Cr k = ((id*7 + f*11 + c*3) mod 17) - 8 — the oracle restates all
    * three.
    */
  def synthYcbcrAvi(id: Long, width: Int, height: Int, frames: Int): Array[Byte] = {
    aviContainer(width, height, frames, f =>
      synthJpegYcbcr420(width, height,
        b => (((id * 31 + f * 17 + b * 7) % 17) - 8).toInt,
        c => ((((id * 13 + f * 7 + c * 5) % 17) - 8).toInt,
          (((id * 7 + f * 11 + c * 3) % 17) - 8).toInt)))
  }

  /** Demo color source over `documents`: w ∈ {16,32}, h ∈ {16,32,48},
    * 1–4 frames; the same pre-synthesis id spread as the gray source.
    */
  def synthesizeYcbcrAviVideos(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => (id, synthYcbcrAvi(id, ((id % 2 + 1) * 16).toInt,
        ((id % 3 + 1) * 16).toInt, (id % 4 + 1).toInt)))
      .toDF("doc_id", "payload")
  }

  // ---- JPEG decoder (baseline, YCbCr 4:2:0 interleaved) -------------------

  /** Per-frame color stats from a REAL three-component baseline decode:
    * same marker walk, Huffman and sparse-IDCT machinery as the gray
    * path, extended with per-component quant/table selection (SOF0 Tq,
    * SOS Td/Ta — all four DHT slots honored from the stream), per-
    * component DC predictors, and the 4:2:0 interleaved MCU walk
    * (4 Y + Cb + Cr per MCU). Chroma planes are ceil(w/2) × ceil(h/2);
    * edge blocks count only in-bounds pixels on each plane. Returns
    * (w, h, ySum, yMin, yMax, cbSum, cbMin, cbMax, crSum, crMin, crMax).
    * DRI/RSTn remain unsupported (as in the gray path).
    */
  private[ops] def decodeJpegColorStats(b: Array[Byte]):
      Option[(Int, Int, Long, Int, Int, Long, Int, Int, Long, Int, Int)] = {
    val h = parseJpegHeader(b) match {
      // This decoder implements the 4:2:0 layout: Y 2x2, chroma 1x1.
      case Some(x) if x.nf == 3 && x.compHv(0) == 0x22 &&
        x.compHv(1) == 0x11 && x.compHv(2) == 0x11 => x
      case _ => return None
    }
    val width = h.width
    val height = h.height
    val quant = h.quant
    val dcTabs = h.dcTabs
    val acTabs = h.acTabs
    val compTq = h.compTq
    val compTd = h.compTd
    val compTa = h.compTa
    val mcuW = (width + 15) / 16
    val mcuH = (height + 15) / 16
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val rd = new BitReader(b, h.scanAt)
    val blockPix = new Array[Int](64)
    val coefScratch = new Array[Int](64)
    val idctScratch = new Array[Double](64)
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    val preds = new Array[Int](3)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var sub = 0
        while (sub < 4) { // Y blocks: 2x2 within the MCU
          val nd = decodeBlockStats(rd, dcTabs(compTd(0)), acTabs(compTa(0)),
            quant(compTq(0)), preds(0), blockPix, coefScratch, idctScratch)
          if (nd == Int.MinValue) return None
          preds(0) = nd
          val bx = mx * 16 + (sub % 2) * 8
          val by = my * 16 + (sub / 2) * 8
          accumulate(blockPix, bx, by, width, height, sums, mins, maxs, 0)
          sub += 1
        }
        var cc = 1
        while (cc < 3) { // Cb then Cr, one block each on the half plane
          val nd = decodeBlockStats(rd, dcTabs(compTd(cc)), acTabs(compTa(cc)),
            quant(compTq(cc)), preds(cc), blockPix, coefScratch, idctScratch)
          if (nd == Int.MinValue) return None
          preds(cc) = nd
          accumulate(blockPix, mx * 8, my * 8, cw, ch, sums, mins, maxs, cc)
          cc += 1
        }
        mx += 1
      }
      my += 1
    }
    Some((width, height, sums(0), mins(0), maxs(0),
      sums(1), mins(1), maxs(1), sums(2), mins(2), maxs(2)))
  }

  /** In-bounds pixel accumulation of one 8x8 block at (bx, by) on a
    * plane of (pw, ph), into channel `ch` of the stat arrays.
    */
  private def accumulate(blockPix: Array[Int], bx: Int, by: Int,
      pw: Int, ph: Int, sums: Array[Long], mins: Array[Int],
      maxs: Array[Int], ch: Int): Unit = {
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        if (bx + xx < pw && by + yy < ph) {
          val p = blockPix(yy * 8 + xx)
          sums(ch) += p
          if (p < mins(ch)) mins(ch) = p
          if (p > maxs(ch)) maxs(ch) = p
        }
        xx += 1
      }
      yy += 1
    }
  }

  /** REAL color MJPEG frame decode over AVI payloads — the gray walk with
    * the three-component decoder. Returns (doc_id, frame_idx, width,
    * height, y_sum, y_min, y_max, cb_sum, cb_min, cb_max, cr_sum,
    * cr_min, cr_max).
    */
  def aviColorFrameStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val rows = Seq.newBuilder[
          (Long, Int, Int, Int, Long, Int, Int, Long, Int, Int, Long, Int, Int)]
        walkMoviFrames(b) { (f, frame) =>
          val dec =
            try decodeJpegColorStats(frame)
            catch { case scala.util.control.NonFatal(_) => None }
          dec match {
            case Some((w, h, ys, ymn, ymx, cs, cmn, cmx, rs, rmn, rmx)) =>
              rows += ((id, f, w, h, ys, ymn, ymx, cs, cmn, cmx, rs, rmn, rmx))
              true
            case None => false
          }
        }
        rows.result()
      }
      .toDF("doc_id", "frame_idx", "width", "height", "y_sum", "y_min",
        "y_max", "cb_sum", "cb_min", "cb_max", "cr_sum", "cr_min", "cr_max")
  }
}
