package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque payload bytes + typed envelope. */
case class MediaFile(docId: Long, kind: String, payload: Array[Byte])

/** Decoded metadata + features (the schema a real decoder would fill). */
case class MediaMeta(docId: Long, kind: String, byteLen: Int, width: Int,
    height: Int, nFrames: Int, fingerprint: String)

/** Multimodal-column plumbing (SURVEY §7.6): image/audio/video payloads ride
  * as opaque binary columns with typed metadata; decode/feature-extraction
  * runs per partition so heavyweight codecs initialize once per task, not
  * per row — the Spark-side batch shape that matters at 100 TB.
  *
  * Decoders are passed as FACTORIES (`() => Decoder`), not decoder values:
  * the factory is what the closure serializes, and it is invoked INSIDE
  * mapPartitions — so a codec holding native buffers is constructed on the
  * executor, once per task. A bare `Decoder` value would be constructed on
  * the driver and either fail serialization or share one native handle
  * across all executor threads.
  *
  * STUB NOTE: this container has no media libraries, so the default decoder
  * is a clearly-marked deterministic fake deriving dimensions from the
  * payload digest. Three UNCOMPRESSED formats are decoded for real with
  * zero libraries — binary PPM ([[decodePpm]]), 24-bit BMP
  * ([[decodeBmp]]/[[encodeBmp]]), and 16-bit PCM WAV audio
  * ([[decodeWav]]/[[encodeWav]]) — so the decode path is genuinely
  * exercised end-to-end for images AND audio (q106/q115/q128);
  * compressed formats keep the labeled stub. The partitioning, schema, typed Dataset plumbing and the
  * per-partition decoder lifecycle are real and tested; swap `stubDecoder`
  * for a JNI/codec-backed factory in production.
  */
object Multimodal {

  /** (width, height, frames) from payload bytes. */
  type Decoder = Array[Byte] => (Int, Int, Int)

  /** Factory invoked once per partition, on the executor. */
  type DecoderFactory = () => Decoder

  /** Deterministic fake: dimensions from the md5 hex of the payload; frame
    * count from the DECODED character length (UTF-8), matching the
    * expression-level stub in q29_multimodal_meta (`n_chars / 100 + 1`) so
    * the typed path and the SQL path cross-check each other on non-ASCII
    * text too — a byte-length-derived count would diverge on any
    * multi-byte character. */
  val stubDecoder: DecoderFactory = () => { bytes =>
    val hex = md5Hex(bytes)
    val w = hex(0).toInt * 8 + hex(1).toInt
    val h = hex(2).toInt * 8 + hex(3).toInt
    val nChars = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .length
    (w, h, nChars / 100 + 1)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  // ---------------------------------------------------------------------
  // REAL decode path: binary PPM (P6). One format the JVM can parse with
  // zero libraries — fixed ASCII header (`P6`, width, height, maxval,
  // with `#` comments) followed by raw 8-bit RGB triplets. This makes the
  // multimodal column demo real end-to-end for one format; other formats
  // keep the labeled stub (no media libraries in this container).
  // ---------------------------------------------------------------------

  /** Parse a binary PPM (P6) payload → (width, height, rgb bytes).
    * Strict: malformed magic/header/short pixel data throw (a corrupt
    * payload must surface per-row, not decode into garbage stats);
    * maxval must fit one byte (16-bit-per-sample PPMs are rejected, not
    * misread). Header grammar per the netpbm spec: tokens separated by
    * whitespace, `#` starts a comment running to end of line, a single
    * whitespace byte separates maxval from the raster. */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodePpm: $msg at byte $pos")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextToken(): String = {
      // skip whitespace and # comments
      var go = true
      while (go) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else go = false
      }
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos)) && bytes(pos) != '#')
        pos += 1
      if (pos == start) fail("missing header token")
      new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    def nextInt(what: String): Int = {
      val t = nextToken()
      try t.toInt catch {
        case _: NumberFormatException => fail(s"non-numeric $what '$t'")
      }
    }
    if (nextToken() != "P6") fail("not a P6 PPM (bad magic)")
    val w = nextInt("width")
    val h = nextInt("height")
    val maxval = nextInt("maxval")
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255)
      fail(s"unsupported maxval $maxval (one byte per sample only)")
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= bytes.length || !isWs(bytes(pos))) fail("missing raster")
    pos += 1
    val need = w * h * 3
    if (bytes.length - pos < need)
      fail(s"short raster: need $need, have ${bytes.length - pos}")
    (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }

  /** REAL decoder factory over [[decodePpm]] (stateless — a PPM needs no
    * per-task codec handle, but it rides the same per-partition factory
    * contract as a native codec would). */
  val ppmDecoder: DecoderFactory = () => { bytes =>
    val (w, h, _) = decodePpm(bytes)
    (w, h, 1)
  }

  /** Integer-exact per-channel sums over an interleaved RGB raster —
    * shared reduce of the decoded-raster queries (PPM q106, BMP q115). */
  private def channelSums(docId: Long, w: Int, h: Int,
      rgb: Array[Byte]): PpmStats = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < rgb.length) {
      r += rgb(i) & 0xff
      g += rgb(i + 1) & 0xff
      b += rgb(i + 2) & 0xff
      i += 3
    }
    PpmStats(docId, w, h, r, g, b)
  }

  /** Per-channel pixel sums from decoded PPM rasters — integer-exact
    * (no float accumulation), so an oracle can replay the construction
    * arithmetic bit-for-bit. Decode + accumulate stream per partition. */
  def ppmPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = decodePpm(m.payload)
        channelSums(m.docId, w, h, rgb)
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL decode path #2: uncompressed 24-bit BMP (BITMAPINFOHEADER,
  // BI_RGB) — the second format the JVM can parse with zero libraries.
  // Unlike PPM's ASCII header + in-order RGB, BMP exercises the layout
  // transforms a real codec performs: little-endian binary headers, BGR
  // channel order, bottom-up row order (or top-down when height < 0),
  // and 4-byte row padding. decodeBmp normalizes all of that back to a
  // top-down interleaved RGB raster, so the PPM and BMP paths meet at
  // the same downstream shape.
  // ---------------------------------------------------------------------

  /** Parse an uncompressed 24-bit BMP payload → (width, height, rgb bytes
    * in top-down row order). Strict, like [[decodePpm]]: bad magic,
    * non-BITMAPINFOHEADER DIB size, planes ≠ 1, bit depth ≠ 24,
    * compression ≠ BI_RGB, zero dimensions, or a short/out-of-range pixel
    * array all throw — a corrupt payload must surface per-row, not decode
    * into garbage stats. Negative height (top-down storage) is honored
    * per the spec. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeBmp: $msg")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (bytes.length < 54) fail(s"short header: ${bytes.length} bytes")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("not a BMP (bad magic)")
    val pixelOff = i32(10)
    val dibSize = i32(14)
    if (dibSize != 40)
      fail(s"unsupported DIB header size $dibSize (BITMAPINFOHEADER only)")
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    if (w <= 0 || h == 0) fail(s"bad dimensions ${w}x$hRaw")
    if (u16(26) != 1) fail(s"planes ${u16(26)} (must be 1)")
    if (u16(28) != 24) fail(s"bit depth ${u16(28)} (24-bit BI_RGB only)")
    if (i32(30) != 0) fail(s"compression ${i32(30)} (BI_RGB only)")
    val rowSize = ((w * 3 + 3) / 4) * 4 // each row padded to 4 bytes
    if (pixelOff < 54 || pixelOff.toLong + rowSize.toLong * h > bytes.length)
      fail(s"pixel array out of range: off $pixelOff, need ${rowSize.toLong * h}, " +
        s"have ${bytes.length - pixelOff}")
    val rgb = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      // stored bottom-up unless topDown; stored channel order is BGR
      val src = pixelOff + (if (topDown) row else h - 1 - row) * rowSize
      var colIdx = 0
      while (colIdx < w) {
        val s = src + colIdx * 3
        val d = (row * w + colIdx) * 3
        rgb(d) = bytes(s + 2)     // R
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s)     // B
        colIdx += 1
      }
      row += 1
    }
    (w, h, rgb)
  }

  /** Encode a top-down interleaved RGB raster as an uncompressed 24-bit
    * BMP (BITMAPINFOHEADER, BI_RGB, bottom-up rows, zero padding) — the
    * sink-side inverse of [[decodeBmp]]; round-trip is byte-exact on the
    * raster. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"encodeBmp: bad dimensions ${w}x$h")
    require(rgb.length == w * h * 3,
      s"encodeBmp: raster length ${rgb.length} != ${w * h * 3}")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val fileSize = 54 + rowSize * h
    val out = new Array[Byte](fileSize) // zero-initialized → zero padding
    def p16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, fileSize); p32(10, 54)
    p32(14, 40); p32(18, w); p32(22, h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, rowSize * h)
    var row = 0
    while (row < h) {
      val dst = 54 + (h - 1 - row) * rowSize // bottom-up
      var colIdx = 0
      while (colIdx < w) {
        val s = (row * w + colIdx) * 3
        val d = dst + colIdx * 3
        out(d) = rgb(s + 2)     // B
        out(d + 1) = rgb(s + 1) // G
        out(d + 2) = rgb(s)     // R
        colIdx += 1
      }
      row += 1
    }
    out
  }

  /** REAL decoder factory over [[decodeBmp]] — same per-partition factory
    * contract as [[ppmDecoder]]. */
  val bmpDecoder: DecoderFactory = () => { bytes =>
    val (w, h, _) = decodeBmp(bytes)
    (w, h, 1)
  }

  /** Deterministic BMP payload for doc `d` — a REAL bottom-up padded BGR
    * byte stream whose DECODED top-down RGB raster follows closed-form
    * arithmetic `(d*37 + i) % 256`, so a SQL oracle predicts the decoded
    * channel sums without a decoder. Because the closed form describes
    * the DECODED raster, any layout bug (row flip, BGR swap, padding
    * arithmetic) shifts the sums and breaks the oracle hash. Width is NOT
    * a multiple of 4 for most docs, so row padding is genuinely
    * exercised. */
  def syntheticBmp(d: Long): Array[Byte] = {
    val w = (3 + d % 5).toInt // 3..7 → rowSize padding of 3,0,1,2,3 bytes
    val h = (2 + d % 4).toInt
    encodeBmp(w, h,
      Array.tabulate(w * h * 3)(i => ((d * 37 + i) % 256).toByte))
  }

  /** Per-channel pixel sums from decoded BMP payloads — the BMP twin of
    * [[ppmPixelStats]], meeting it at the same integer-exact shape. */
  def bmpPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = decodeBmp(m.payload)
        channelSums(m.docId, w, h, rgb)
      }
    }
  }

  /** Deterministic PPM payload for doc `d` — a REAL P6 byte stream
    * (header + raster) whose pixel bytes follow closed-form arithmetic
    * `(d*31 + i) % 256`, so a SQL oracle can predict the decoded sums
    * without a decoder. Exercises the real parse path end-to-end. */
  def syntheticPpm(d: Long): Array[Byte] = {
    val w = (4 + d % 5).toInt
    val h = (3 + d % 4).toInt
    val header = s"P6\n# graft synthetic $d\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = Array.tabulate(w * h * 3)(i => ((d * 31 + i) % 256).toByte)
    header ++ raster
  }

  // ---------------------------------------------------------------------
  // REAL decode path #3: PCM WAV (RIFF/WAVE, 16-bit) — AUDIO, the third
  // uncompressed format the JVM can parse with zero libraries. Exercises
  // what the image paths don't: RIFF chunk WALKING (unknown chunks like
  // LIST/INFO must be skipped by declared size, not assumed absent),
  // multi-channel interleaving, and signed little-endian samples.
  // ---------------------------------------------------------------------

  /** Parse a PCM WAV payload → (numChannels, sampleRate, interleaved
    * signed 16-bit samples). Strict, like [[decodePpm]]/[[decodeBmp]]:
    * bad RIFF/WAVE magic, a truncated chunk, a missing fmt/data chunk,
    * non-PCM audio format, bit depth ≠ 16, or a data size that is not a
    * whole number of frames all throw. Unknown chunks between fmt and
    * data are skipped by their declared size (word-aligned, per RIFF). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeWav: $msg")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(bytes, o, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12) fail(s"short header: ${bytes.length} bytes")
    if (tag(0) != "RIFF") fail("not a RIFF file (bad magic)")
    if (tag(8) != "WAVE") fail(s"not a WAVE form: '${tag(8)}'")
    var pos = 12
    var nCh = -1
    var rate = -1
    var samples: Array[Short] = null
    while (samples == null) {
      if (pos + 8 > bytes.length)
        fail(if (nCh < 0) "no fmt chunk" else "no data chunk")
      val id = tag(pos)
      val size = i32(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length)
        fail(s"chunk '$id' size $size overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too small: $size")
          if (u16(pos + 8) != 1) fail(s"audio format ${u16(pos + 8)} (PCM only)")
          nCh = u16(pos + 10)
          rate = i32(pos + 12)
          if (nCh <= 0) fail(s"bad channel count $nCh")
          if (rate <= 0) fail(s"bad sample rate $rate")
          if (u16(pos + 22) != 16)
            fail(s"bit depth ${u16(pos + 22)} (16-bit PCM only)")
        case "data" =>
          if (nCh < 0) fail("data chunk before fmt")
          if (size % (2 * nCh) != 0)
            fail(s"data size $size is not whole ${nCh}-channel frames")
          samples = Array.tabulate(size / 2)(k =>
            u16(pos + 8 + 2 * k).toShort)
        case _ => // LIST, fact, … — skip by declared (word-aligned) size
      }
      pos += 8 + size + (size & 1)
    }
    (nCh, rate, samples)
  }

  /** Encode interleaved signed 16-bit samples as a canonical PCM WAV —
    * the sink-side inverse of [[decodeWav]]; round-trip is sample-exact. */
  def encodeWav(nCh: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
    require(nCh > 0 && rate > 0, s"encodeWav: bad format ${nCh}ch @$rate")
    require(samples.length % nCh == 0,
      s"encodeWav: ${samples.length} samples not whole $nCh-channel frames")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def pTag(o: Int, s: String): Unit =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(out, o)
    def p16(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
    }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    pTag(0, "RIFF"); p32(4, 36 + dataSize); pTag(8, "WAVE")
    pTag(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, nCh)
    p32(24, rate); p32(28, rate * nCh * 2); p16(32, nCh * 2); p16(34, 16)
    pTag(36, "data"); p32(40, dataSize)
    var k = 0
    while (k < samples.length) {
      p16(44 + 2 * k, samples(k) & 0xffff)
      k += 1
    }
    out
  }

  /** Deterministic WAV payload for doc `d` — a REAL RIFF byte stream
    * whose decoded interleaved samples follow closed-form arithmetic
    * `(d*13 + k) % 65536 - 32768` (k = linear sample index), so a SQL
    * oracle predicts the per-channel sums with no decoder. Channel count
    * alternates 1/2 (interleaving exercised), and even docs carry a LIST
    * chunk between fmt and data (chunk WALKING exercised — a decoder
    * that assumes data at offset 36 breaks the hash). */
  def syntheticWav(d: Long): Array[Byte] = {
    val nCh = (1 + d % 2).toInt
    val rate = (8000 + (d % 3) * 4000).toInt
    val nFrames = (20 + d % 7).toInt
    val samples = Array.tabulate(nFrames * nCh)(k =>
      ((d * 13 + k) % 65536 - 32768).toShort)
    val canonical = encodeWav(nCh, rate, samples)
    if (d % 2 == 0) {
      // splice "LIST" + size 4 + "INFO" between fmt and data
      val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N',
        'F', 'O')
      val out = new Array[Byte](canonical.length + extra.length)
      System.arraycopy(canonical, 0, out, 0, 36)
      System.arraycopy(extra, 0, out, 36, extra.length)
      System.arraycopy(canonical, 36, out, 36 + extra.length,
        canonical.length - 36)
      // patch the RIFF size for the spliced bytes
      val riffSize = canonical.length - 8 + extra.length
      out(4) = riffSize.toByte; out(5) = (riffSize >> 8).toByte
      out(6) = (riffSize >> 16).toByte; out(7) = (riffSize >> 24).toByte
      out
    } else canonical
  }

  /** Per-channel sample sums from decoded WAV payloads — audio's
    * integer-exact twin of [[ppmPixelStats]]/[[bmpPixelStats]]. Mono
    * payloads report sum_ch1 = 0. */
  def wavSampleStats(ds: Dataset[MediaFile]): Dataset[WavStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (nCh, rate, samples) = decodeWav(m.payload)
        var s0 = 0L
        var s1 = 0L
        var k = 0
        while (k < samples.length) {
          if (k % nCh == 0) s0 += samples(k) else s1 += samples(k)
          k += 1
        }
        WavStats(m.docId, nCh, rate, samples.length / nCh, s0, s1)
      }
    }
  }

  /** REAL decoder factory over [[decodeWav]] — (channels, sampleRate)
    * stand in for (w, h) in the shared [[MediaMeta]] envelope. */
  val wavDecoder: DecoderFactory = () => { bytes =>
    val (nCh, rate, samples) = decodeWav(bytes)
    (nCh, rate, samples.length / nCh)
  }

  /** Decode + feature-extract per partition. The decoder is created once
    * per partition (a real codec holds native buffers); rows stream through
    * an iterator — no materialization of the partition. */
  def decodeMeta(ds: Dataset[MediaFile],
      decoder: DecoderFactory = stubDecoder): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val dec = decoder() // per-partition init, on the executor
      it.map { m =>
        val (w, h, frames) = dec(m.payload)
        MediaMeta(m.docId, m.kind, m.payload.length, w, h, frames,
          md5Hex(m.payload))
      }
    }
  }

  /** Adapter: the driver `documents` table as fake media payloads (text
    * bytes as payload) — lets the typed pipeline run against real parquet. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    graft.queries.Tables(spark, dir, "documents")
      .select(col("doc_id").as("docId"), lit("text/fake").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaFile]
  }

  /** Resize: the 1:1 payload-transform batch shape. The stub emits a
    * deterministic digest-derived payload of w*h/64 bytes; a real
    * implementation swaps `resizer` for a codec-backed factory. The
    * envelope records the new dimensions so downstream stages never
    * re-decode. */
  def resize(ds: Dataset[MediaFile], w: Int, h: Int,
      resizer: () => (Array[Byte], Int, Int) => Array[Byte] = stubResizer)
      : Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val rs = resizer() // per-partition init, on the executor
      it.map { m =>
        val out = rs(m.payload, w, h)
        MediaMeta(m.docId, m.kind, out.length, w, h, 1, md5Hex(out))
      }
    }
  }

  val stubResizer: () => (Array[Byte], Int, Int) => Array[Byte] =
    () => { (bytes, w, h) =>
      val n = math.max(1, w * h / 64)
      val seed = MessageDigest.getInstance("MD5").digest(bytes)
      Array.tabulate(n)(i => seed(i % seed.length))
    }

  /** One row per sampled frame — the 1:N fan-out batch shape (video →
    * frames). Frame payloads derive deterministically from (payload,
    * frameIdx); `every` controls the stride (validated on the driver: a
    * zero stride would otherwise throw per-row deep inside a stage, and a
    * negative one would silently emit no frames). The iterator streams
    * frames out, so a long video never materializes in memory at once. */
  def sampleFrames(ds: Dataset[MediaFile], every: Int,
      decoder: DecoderFactory = stubDecoder): Dataset[FrameSample] = {
    require(every > 0, s"frame stride `every` must be positive, got $every")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val dec = decoder() // per-partition init, on the executor
      it.flatMap { m =>
        val (_, _, nFrames) = dec(m.payload)
        (0 until nFrames by every).iterator.map { f =>
          FrameSample(m.docId, f,
            md5Hex(m.payload ++ BigInt(f).toByteArray))
        }
      }
    }
  }
}

/** One sampled frame: parent doc, frame index, frame digest (the stub's
  * stand-in for decoded frame bytes). */
case class FrameSample(docId: Long, frameIdx: Int, frameDigest: String)

/** Decoded-raster channel sums (integer-exact) for one image payload —
  * shared by the PPM (q106) and BMP (q115) decode paths. */
case class PpmStats(doc_id: Long, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** Decoded-sample channel sums (integer-exact) for one audio payload —
  * the WAV (q128) decode path. Mono payloads report sum_ch1 = 0. */
case class WavStats(doc_id: Long, n_channels: Int, sample_rate: Int,
    n_frames: Int, sum_ch0: Long, sum_ch1: Long)
