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
  * payload digest. Four formats are decoded for real with zero external
  * libraries — binary PPM ([[decodePpm]]), 24-bit BMP
  * ([[decodeBmp]]/[[encodeBmp]]), 16-bit PCM WAV audio
  * ([[decodeWav]]/[[encodeWav]]), and COMPRESSED 8-bit truecolor PNG
  * ([[decodePng]]/[[encodePng]], built on the JDK's Inflater/CRC32) — so
  * the decode path is genuinely exercised end-to-end for images AND audio,
  * including real entropy-coded formats (q106/q115/q128/q140), plus
  * baseline+progressive JPEG written from ITU-T T.81 ([[Jpeg]]). MP3 and
  * H.264 carry REAL structural parsers written from their public
  * specs — [[Mp3]] walks the full MPEG-1 Layer III frame sequence
  * (ID3 skip, VBR header census, exact frame sizing) AND parses the
  * bit-packed per-frame side information (reservoir, bit budgets,
  * short-block density — q168/q202, oracle-gated), and [[H264]] walks
  * Annex-B NALs with emulation-prevention un-escaping and a full
  * Exp-Golomb SPS parse (q169, oracle-gated) — which is the layer a
  * curation pipeline filters on.
  *
  * SCOPE CLOSURE (not a pending stub): their SAMPLE-grade decode — MP3
  * Layer III PCM synthesis (Huffman main data, requantization, IMDCT,
  * polyphase filterbank) and H.264 CABAC/CAVLC macroblock decoding — is
  * formally OUT OF SCOPE for this engine. The deciding criterion is the
  * repo's own validation standard: every shipped codec is pinned against
  * an INDEPENDENT implementation or a closed-form oracle (JPEG against
  * the JDK's ImageIO decoder, PNG against Inflater round-trips, the
  * rest against arithmetic oracles); this container has no independent
  * MP3/H.264 decoder, and PCM/pixel output of a from-scratch port of
  * the spec's ~34 Huffman tables + 512-tap synthesis window (resp.
  * CABAC context tables) could only ever be checked against itself.
  * Self-consistent-only decoders do not meet the bar, so the structural
  * layers above are the deliberate boundary; a production deployment
  * plugs a codec-backed `DecoderFactory` into the same tested plumbing.
  * The partitioning, schema, typed Dataset plumbing and the
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
    * shared reduce of the decoded-raster queries (PPM q106, BMP q115,
    * PNG q140, GIF q149). */
  private[ext] def channelSums(docId: Long, w: Int, h: Int,
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
  /** WAV corpus with PLANTED near-dup families for audio fingerprint
    * dedup (q181): doc `d` shares a pseudo-random base signal with every
    * sibling of its family `d % 63` (the square term in `k` breaks the
    * linear-ramp degeneracy of [[syntheticWav]], whose consecutive
    * samples differ by exactly 1 — a shape-based fingerprint collapses
    * to one value on a ramp), plus a per-doc ±64 jitter. Sibling energy
    * gaps are typically thousands, so the jitter flips a
    * sign-of-derivative bit only when a gap lands within ±128 (~1.6% per
    * bit → expected hamming ≪ 1 inside a family, ~16 across families):
    * families are GENUINE near-dups, non-siblings genuinely far.
    * Mono, 8 kHz, 33 frames → a 32-bit derivative fingerprint. */
  def syntheticWavFamily(d: Long): Array[Byte] = {
    val fam = d % 63
    val samples = Array.tabulate(33) { k =>
      val base = (fam * 2654435761L + k.toLong * k * 2246822519L +
        k * 40503L) % 32768L - 16384L
      val jit = (d * 13 + k * 7) % 129L - 64L
      (base + jit).toShort
    }
    encodeWav(1, 8000, samples)
  }

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

  // ---------------------------------------------------------------------
  // REAL decode path #4: PNG (8-bit truecolor, non-interlaced) — the first
  // COMPRESSED format, decoded with zero media libraries: the JDK ships
  // the two primitives PNG needs (java.util.zip.Inflater for the DEFLATE
  // stream, java.util.zip.CRC32 for chunk checksums). Exercises what the
  // uncompressed formats can't: chunk framing with checksums, a real
  // entropy-coded payload, and the five per-row predictive filters
  // (None/Sub/Up/Average/Paeth) whose inversion is the decode. Grammar and
  // filter algebra per the public PNG spec (RFC 2083 / W3C PNG).
  // ---------------------------------------------------------------------

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Parse a PNG payload → (width, height, rgb bytes top-down). Strict,
    * like the other codecs: bad signature, CRC mismatch on any chunk,
    * non-IHDR first chunk, bit depth ≠ 8, color type ≠ 2 (truecolor RGB),
    * interlacing, a malformed DEFLATE stream, an inflated size that is not
    * exactly h·(1+3w), an unknown filter type byte, missing IDAT/IEND, or
    * trailing bytes after IEND all throw — a corrupt payload must surface
    * per-row, not decode into garbage stats. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodePng: $msg")
    def i32(o: Int): Int = ((bytes(o) & 0xff) << 24) |
      ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) |
      (bytes(o + 3) & 0xff)
    if (bytes.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), PngSig))
      fail("bad signature")
    var pos = 8
    var w = -1
    var h = -1
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (pos + 8 > bytes.length) fail("truncated chunk header")
      val len = i32(pos)
      val typ = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (len < 0 || pos + 12 + len > bytes.length)
        fail(s"chunk '$typ' length $len overruns payload")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != i32(pos + 8 + len))
        fail(s"CRC mismatch on chunk '$typ'")
      typ match {
        case "IHDR" =>
          if (w >= 0) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          w = i32(pos + 8); h = i32(pos + 12)
          if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
          val (depth, color) = (bytes(pos + 16), bytes(pos + 17))
          if (depth != 8) fail(s"bit depth $depth (8 only)")
          if (color != 2) fail(s"color type $color (truecolor RGB only)")
          if (bytes(pos + 18) != 0) fail("unknown compression method")
          if (bytes(pos + 19) != 0) fail("unknown filter method")
          if (bytes(pos + 20) != 0) fail("interlaced PNGs unsupported")
        case "IDAT" =>
          if (w < 0) fail("IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          if (len != 0) fail(s"IEND length $len")
          sawIend = true
        case _ if w < 0 => fail(s"first chunk '$typ' (IHDR required)")
        case _ => // ancillary chunk (tEXt, …) — CRC-checked above, skipped
      }
      pos += 12 + len
    }
    if (pos != bytes.length) fail(s"${bytes.length - pos} bytes after IEND")
    if (idat.size == 0) fail("no IDAT chunk")
    // inflate the concatenated IDAT stream to exactly h*(1+3w) bytes
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      var progressing = true
      while (progressing && got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        got += n
        progressing = n > 0
      }
      if (got != raw.length)
        fail(s"inflated $got bytes, expected ${raw.length}")
      // the stream must END here: extra compressed rows would silently
      // vanish if we only checked the byte count
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) != 0)
        fail(s"DEFLATE stream longer than ${raw.length} bytes")
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"malformed DEFLATE stream: ${e.getMessage}")
    } finally inf.end()
    // invert the per-row filters → top-down interleaved RGB
    val rgb = new Array[Byte](w * h * 3)
    val bpp = 3
    var row = 0
    while (row < h) {
      val ft = raw(row * stride) & 0xff
      var x = 0
      while (x < w * 3) {
        val cur = raw(row * stride + 1 + x) & 0xff
        val left = if (x >= bpp) rgb(row * w * 3 + x - bpp) & 0xff else 0
        val up = if (row > 0) rgb((row - 1) * w * 3 + x) & 0xff else 0
        val upLeft = if (row > 0 && x >= bpp)
          rgb((row - 1) * w * 3 + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor, per the spec's exact tie-break order
            val p = left + up - upLeft
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - upLeft))
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up
                   else upLeft)
          case other => fail(s"unknown filter type $other in row $row")
        }
        rgb(row * w * 3 + x) = recon.toByte
        x += 1
      }
      row += 1
    }
    (w, h, rgb)
  }

  /** Encode a top-down RGB raster as a PNG (8-bit truecolor). Row `r` is
    * filtered with type `r % 5`, so a round-trip exercises ALL FIVE filter
    * inversions — an encoder that always picked filter 0 would leave the
    * interesting 4/5 of [[decodePng]] untested. Round-trip is raster-exact
    * (the filters are lossless predictors, DEFLATE is lossless). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"encodePng: bad dimensions ${w}x$h")
    require(rgb.length == w * h * 3,
      s"encodePng: raster length ${rgb.length} != ${w * h * 3}")
    val bpp = 3
    val stride = 1 + 3 * w
    val raw = new Array[Byte](h * stride)
    var row = 0
    while (row < h) {
      val ft = row % 5
      raw(row * stride) = ft.toByte
      var x = 0
      while (x < w * 3) {
        val cur = rgb(row * w * 3 + x) & 0xff
        val left = if (x >= bpp) rgb(row * w * 3 + x - bpp) & 0xff else 0
        val up = if (row > 0) rgb((row - 1) * w * 3 + x) & 0xff else 0
        val upLeft = if (row > 0 && x >= bpp)
          rgb((row - 1) * w * 3 + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ =>
            val p = left + up - upLeft
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - upLeft))
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        raw(row * stride + 1 + x) = (cur - pred).toByte
        x += 1
      }
      row += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = out.toByteArray
    val png = new java.io.ByteArrayOutputStream()
    png.write(PngSig, 0, 8)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int): Array[Byte] = Array((v >> 24).toByte,
        (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      png.write(be32(data.length), 0, 4)
      png.write(t, 0, 4)
      png.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      png.write(be32(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2 // depth 8, truecolor
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", idat)
    writeChunk("IEND", Array.emptyByteArray)
    png.toByteArray
  }

  /** Deterministic PNG payload for doc `d` — a REAL compressed byte stream
    * (signature, CRC'd chunks, DEFLATE'd filtered rows) whose DECODED
    * raster follows closed-form arithmetic `(d*41 + i) % 256`, so a SQL
    * oracle predicts the decoded channel sums with no decoder. Heights are
    * ≥ 5 so every payload exercises all five row filters (row r uses
    * filter r % 5); any bug in chunk walking, CRC math, inflation, or a
    * filter inversion shifts a sum and breaks the hash. */
  def syntheticPng(d: Long): Array[Byte] = {
    val w = (3 + d % 5).toInt
    val h = (5 + d % 4).toInt
    encodePng(w, h,
      Array.tabulate(w * h * 3)(i => ((d * 41 + i) % 256).toByte))
  }

  /** REAL decoder factory over [[decodePng]] — same per-partition factory
    * contract as the other codecs. */
  val pngDecoder: DecoderFactory = () => { bytes =>
    val (w, h, _) = decodePng(bytes)
    (w, h, 1)
  }

  /** Per-channel pixel sums from decoded PNG payloads — the compressed
    * sibling of [[ppmPixelStats]]/[[bmpPixelStats]], meeting them at the
    * same integer-exact shape. */
  def pngPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = decodePng(m.payload)
        channelSums(m.docId, w, h, rgb)
      }
    }
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

  /** Coarse audio fingerprint over decoded WAV payloads: bit i is the
    * SIGN OF THE FRAME-ENERGY DERIVATIVE (energy(i+1) > energy(i) over
    * the first `frames` frames; energy = Σ_channels |sample| — the
    * spectral-flux-shaped signature every constant-Q fingerprinter
    * coarsens to, FFT-free so it stays integer-exact and
    * oracle-replayable). Equal-width strings feed
    * [[graft.dedup.Dedup.simhashPairs]]' banded near-dup search
    * unchanged — audio joins text (MinHash), embeddings (cosine), and
    * images (dHash) on the same candidate-pair machinery. Strict: a
    * payload shorter than `frames` frames fails loudly. */
  def wavFingerprints(ds: Dataset[MediaFile], frames: Int = 33)
      : Dataset[WavFingerprint] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val (nCh, _, samples) = decodeWav(m.payload)
      val nFr = samples.length / nCh
      require(nFr >= frames,
        s"wavFingerprints: need >= $frames frames, got $nFr " +
          s"for doc ${m.docId}")
      val e = Array.tabulate(frames) { i =>
        var s = 0L
        var c = 0
        while (c < nCh) {
          s += math.abs(samples(i * nCh + c).toInt)
          c += 1
        }
        s
      }
      val bits = new StringBuilder(frames - 1)
      var i = 1
      while (i < frames) {
        bits.append(if (e(i) > e(i - 1)) '1' else '0')
        i += 1
      }
      WavFingerprint(m.docId, bits.toString)
    })
  }

  /** Audio FEATURE extraction over decoded WAV payloads — one row per
    * (doc, channel): zero-crossing count (adjacent in-channel samples
    * with strictly negative product — the classic voiced/unvoiced and
    * noisiness cue) and signal energy (Σ s², the loudness/silence cue).
    * Both integer-exact (energy peaks at 26 frames · 32768² ≈ 2.8e10,
    * comfortably in a Long), so the oracle replays them from the
    * synthetic construction arithmetic — decode + both features stream
    * per partition in one pass over the samples. */
  def wavChannelFeatures(ds: Dataset[MediaFile]): Dataset[WavChannelFeats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val (nCh, _, samples) = decodeWav(m.payload)
        val nFrames = samples.length / nCh
        (0 until nCh).iterator.map { c =>
          var zcr = 0L
          var energy = 0L
          var f = 0
          while (f < nFrames) {
            val s = samples(f * nCh + c).toLong
            energy += s * s
            if (f > 0 && samples((f - 1) * nCh + c).toLong * s < 0) zcr += 1
            f += 1
          }
          WavChannelFeats(m.docId, c, nFrames, zcr, energy)
        }
      }
    }
  }

  /** Leading/trailing SILENCE trim boundaries per WAV payload — the
    * audio-prep step before training (dead air carries no signal and
    * skews duration budgets): a frame is silent when every channel's
    * |sample| < `threshold`; the report gives the first and last LOUD
    * frame (−1/−1 for an all-silent payload) and the kept length.
    * Integer-exact, one pass, so the oracle replays the boundaries from
    * the construction arithmetic. Callers slice payloads with
    * [[encodeWav]] over the kept range. */
  def wavTrimBounds(ds: Dataset[MediaFile],
      threshold: Int): Dataset[WavTrim] = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (nCh, _, samples) = decodeWav(m.payload)
        val nFrames = samples.length / nCh
        var first = -1
        var last = -1
        var f = 0
        while (f < nFrames) {
          var loud = false
          var c = 0
          while (c < nCh && !loud) {
            if (math.abs(samples(f * nCh + c).toInt) >= threshold) loud = true
            c += 1
          }
          if (loud) { if (first < 0) first = f; last = f }
          f += 1
        }
        WavTrim(m.docId, nFrames, first, last,
          if (first < 0) 0 else last - first + 1)
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

  /** All five REAL codecs keyed by MIME-ish kind — the routing table for
    * [[decodeMetaByKind]] over a heterogeneous corpus. Lazy: the decoder
    * vals it references are defined across the object body, and an eager
    * Map would capture nulls for the ones initialized after it. */
  lazy val realDecoders: Map[String, DecoderFactory] = Map(
    "image/ppm" -> ppmDecoder,
    "image/bmp" -> bmpDecoder,
    "image/png" -> pngDecoder,
    "image/gif" -> gifDecoder,
    "image/jpeg" -> Jpeg.jpegDecoder,
    "audio/wav" -> wavDecoder,
    "audio/mp3" -> mp3Decoder,
    "video/y4m" -> y4mDecoder,
    "video/h264" -> h264Decoder)

  /** REAL metadata-grade factory over [[Mp3.decodeMp3Meta]] — like the WAV
    * row, (channels, sampleRate) stand in for (w, h) in the shared
    * [[MediaMeta]] envelope; frames = MP3 frame count. */
  val mp3Decoder: DecoderFactory = () => { bytes =>
    val m = Mp3.decodeMp3Meta(bytes)
    (m.channels, m.sampleRate, m.nFrames)
  }

  /** REAL metadata-grade factory over [[H264.decodeH264Meta]] — SPS
    * crop-adjusted dimensions; frames = coded slice count. */
  val h264Decoder: DecoderFactory = () => { bytes =>
    val m = H264.decodeH264Meta(bytes)
    (m.width, m.height, m.nSlices)
  }

  /** REAL decoder factory over [[Gif.decodeGif]] — the second compressed
    * format, with the from-scratch LZW. */
  val gifDecoder: DecoderFactory = () => { bytes =>
    val (w, h, _) = Gif.decodeGif(bytes)
    (w, h, 1)
  }

  /** Per-channel pixel sums from decoded GIF payloads — palette-mapped
    * through the from-scratch LZW, meeting the other image paths at the
    * same integer-exact shape. */
  def gifPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = Gif.decodeGif(m.payload)
        channelSums(m.docId, w, h, rgb)
      }
    }
  }

  /** Per-channel pixel sums from decoded baseline JPEG payloads
    * ([[Jpeg.decodeJpeg]]) — the third compressed format at the shared
    * integer-exact stats shape. JPEG being lossy, the sums have no
    * closed-form SQL oracle; JpegSpec pins them against the JDK's
    * independent codec instead (the sketch-family precedent). */
  def jpegPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = Jpeg.decodeJpeg(m.payload)
        channelSums(m.docId, w, h, rgb)
      }
    }
  }

  /** Decode a MIXED-format corpus in one pass: each partition instantiates
    * every format's decoder once (the per-partition codec lifecycle,
    * per-format), then rows route by their `kind` column — the shape of a
    * real multimodal table, where image/audio/video payloads share one
    * binary column and one scan. An unknown kind fails LOUDLY per row
    * (silently skipping would undercount the corpus); callers with
    * expected-unknown kinds filter them first, explicitly. */
  def decodeMetaByKind(ds: Dataset[MediaFile],
      decoders: Map[String, DecoderFactory] = realDecoders)
      : Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val dec = decoders.map { case (k, f) => k -> f() } // once per task
      it.map { m =>
        val d = dec.getOrElse(m.kind, throw new IllegalArgumentException(
          s"decodeMetaByKind: no decoder for kind '${m.kind}' " +
            s"(doc ${m.docId}); known: ${decoders.keys.toSeq.sorted
              .mkString(", ")}"))
        val (w, h, frames) = d(m.payload)
        MediaMeta(m.docId, m.kind, m.payload.length, w, h, frames,
          md5Hex(m.payload))
      }
    }
  }

  /** Deterministic MIXED-format payload for doc `d` — doc_id % 9 picks the
    * format, so a corpus built from this exercises every REAL parser —
    * both entropy-coded image formats (GIF LZW, JPEG), plus the
    * metadata-grade MP3 and H.264 walkers — inside one scan (q146). */
  def syntheticMedia(d: Long): MediaFile = (d % 9) match {
    case 0 => MediaFile(d, "image/ppm", syntheticPpm(d))
    case 1 => MediaFile(d, "image/bmp", syntheticBmp(d))
    case 2 => MediaFile(d, "image/png", syntheticPng(d))
    case 3 => MediaFile(d, "audio/wav", syntheticWav(d))
    case 4 => MediaFile(d, "video/y4m", syntheticY4m(d))
    case 5 => MediaFile(d, "image/gif", Gif.syntheticGif(d))
    case 6 => MediaFile(d, "image/jpeg", Jpeg.syntheticJpeg(d))
    case 7 => MediaFile(d, "audio/mp3", Mp3.syntheticMp3(d))
    case _ => MediaFile(d, "video/h264", H264.syntheticH264(d))
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

  // ---------------------------------------------------------------------
  // REAL resize path: pixel-level resampling over decoded rasters. Two
  // classical kernels, both integer-exact so an oracle can replay them:
  // nearest-neighbor (the mask/label-image kernel: src = floor(dst·s/d))
  // and box average (the downscale kernel: mean over the source box,
  // floored). The resized raster re-encodes as a REAL payload, so resize
  // output flows back through the decode path like any other media file.
  // ---------------------------------------------------------------------

  /** Encode a top-down interleaved RGB raster as a binary PPM (P6) — the
    * sink-side inverse of [[decodePpm]]; round-trip is raster-exact. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"encodePpm: bad dimensions ${w}x$h")
    require(rgb.length == w * h * 3,
      s"encodePpm: raster length ${rgb.length} != ${w * h * 3}")
    s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ rgb
  }

  /** Nearest-neighbor resample of a top-down RGB raster: output pixel
    * (y, x) copies source pixel (⌊y·srcH/dstH⌋, ⌊x·srcW/dstW⌋) — the
    * standard zero-order kernel (exact for any scale factor, never blends
    * values, which is why it is the kernel of choice for masks/labels). */
  def resizeNearestRgb(srcW: Int, srcH: Int, rgb: Array[Byte],
      dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, s"bad target dimensions ${dstW}x$dstH")
    require(rgb.length == srcW * srcH * 3,
      s"raster length ${rgb.length} != ${srcW * srcH * 3}")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val s = (sy * srcW + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Box-average downsample: output pixel (y, x, c) is the floored mean of
    * the source box [⌊y·srcH/dstH⌋, ⌊(y+1)·srcH/dstH⌋) ×
    * [⌊x·srcW/dstW⌋, ⌊(x+1)·srcW/dstW⌋) — integer-exact (sum then one
    * floor division), so no float accumulation can drift. Downscale only:
    * an empty box (upscale) would divide by zero, so dst ≤ src is
    * required. */
  def resizeBoxRgb(srcW: Int, srcH: Int, rgb: Array[Byte],
      dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, s"bad target dimensions ${dstW}x$dstH")
    require(dstW <= srcW && dstH <= srcH,
      s"box resize is downscale-only: ${srcW}x$srcH -> ${dstW}x$dstH")
    require(rgb.length == srcW * srcH * 3,
      s"raster length ${rgb.length} != ${srcW * srcH * 3}")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val y0 = y * srcH / dstH
      val y1 = (y + 1) * srcH / dstH
      var x = 0
      while (x < dstW) {
        val x0 = x * srcW / dstW
        val x1 = (x + 1) * srcW / dstW
        var c = 0
        while (c < 3) {
          var sum = 0L
          var sy = y0
          while (sy < y1) {
            var sx = x0
            while (sx < x1) {
              sum += rgb((sy * srcW + sx) * 3 + c) & 0xff
              sx += 1
            }
            sy += 1
          }
          out((y * dstW + x) * 3 + c) =
            (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Perceptual image hash: dHash (difference hash, public method — the
  // standard cheap near-dup fingerprint for images). Grayscale, resample
  // to a fixed 8×8 grid, hash = the 56 horizontal brightness-gradient
  // signs (7 compares × 8 rows; 56 bits keeps every arithmetic step in a
  // signed 64-bit integer on BOTH engines — the classic 9×8/64-bit
  // variant would need 2^63). Gradient SIGNS survive exposure/scale
  // changes that break byte-exact hashing, so Hamming distance over
  // dHashes is the image twin of SimHash-over-text.
  // ---------------------------------------------------------------------

  /** 56-bit dHash of a top-down RGB raster: integer grayscale
    * ⌊(r+g+b)/3⌋, nearest-neighbor resample to 8×8 (exact index
    * arithmetic — the same kernel as [[resizeNearestRgb]]), bit
    * y·7+x = 1 iff gray(y, x+1) > gray(y, x). Fully integer-exact, so a
    * SQL oracle replays the hash bit-for-bit. */
  def dhash56(w: Int, h: Int, rgb: Array[Byte]): Long = {
    require(rgb.length == w * h * 3,
      s"dhash56: raster length ${rgb.length} != ${w * h * 3}")
    val g = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val s = ((y * h / 8) * w + (x * w / 8)) * 3
        g(y * 8 + x) =
          ((rgb(s) & 0xff) + (rgb(s + 1) & 0xff) + (rgb(s + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    var hash = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y * 8 + x + 1) > g(y * 8 + x)) hash |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** dHash straight from a PPM payload — through the real decode path. */
  def dhashFromPpm(payload: Array[Byte]): Long = {
    val (w, h, rgb) = decodePpm(payload)
    dhash56(w, h, rgb)
  }

  /** REAL resizer factory over PPM payloads: decode → nearest-neighbor
    * resample → re-encode. Slots into [[resize]]'s per-partition factory
    * contract in place of [[stubResizer]]. */
  val ppmNearestResizer: () => (Array[Byte], Int, Int) => Array[Byte] =
    () => { (bytes, w, h) =>
      val (sw, sh, rgb) = decodePpm(bytes)
      encodePpm(w, h, resizeNearestRgb(sw, sh, rgb, w, h))
    }

  /** Resize PPM payloads to (dstW, dstH) with the nearest-neighbor kernel,
    * emitting REAL re-encoded PPM payloads — resize output is a media file
    * like any other, so it flows straight back into [[ppmPixelStats]]
    * (q141 chains exactly that: decode → resample → encode → decode). */
  def resizePpmNearest(ds: Dataset[MediaFile], dstW: Int,
      dstH: Int): Dataset[MediaFile] = {
    require(dstW > 0 && dstH > 0, s"bad target dimensions ${dstW}x$dstH")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val rs = ppmNearestResizer() // per-partition init, on the executor
      it.map(m => MediaFile(m.docId, m.kind, rs(m.payload, dstW, dstH)))
    }
  }

  // ---------------------------------------------------------------------
  // REAL decode path #5: YUV4MPEG2 (Y4M) — VIDEO, the uncompressed
  // interchange format every ffmpeg pipeline can emit. An ASCII stream
  // header ("YUV4MPEG2 W.. H.. F..:.." + optional tags) followed by
  // frames, each an ASCII "FRAME" marker line + raw planar YUV bytes.
  // Exercises what the image formats don't: MULTI-FRAME payloads with
  // per-frame framing, and planar (not interleaved) channel layout. C444
  // (full-rate chroma) only — subsampled layouts are rejected, not
  // misread. Frames decode via a bounded-memory iterator: one frame's
  // planes at a time, never the whole video.
  // ---------------------------------------------------------------------

  /** Parsed Y4M stream header + frame geometry. */
  private final case class Y4mHeader(w: Int, h: Int, frameBytes: Int,
      bodyOff: Int)

  private def parseY4mHeader(bytes: Array[Byte]): Y4mHeader = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeY4m: $msg")
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) fail("no stream-header line")
    val header = new String(bytes, 0, nl,
      java.nio.charset.StandardCharsets.US_ASCII)
    val parts = header.split(' ')
    if (parts.head != "YUV4MPEG2") fail(s"bad magic '${parts.head}'")
    var w = -1
    var h = -1
    var rate = ""
    var chroma = "C420jpeg" // the spec's default when no C tag is present
    parts.tail.foreach { p =>
      if (p.isEmpty) fail("empty stream-header parameter")
      else p.head match {
        case 'W' => w = p.tail.toIntOption.getOrElse(fail(s"bad width '$p'"))
        case 'H' => h = p.tail.toIntOption.getOrElse(fail(s"bad height '$p'"))
        case 'F' => rate = p.tail
        case 'C' => chroma = p
        case 'I' | 'A' | 'X' => // interlacing/aspect/comment — irrelevant here
        case _ => fail(s"unknown stream-header parameter '$p'")
      }
    }
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (!rate.matches("\\d+:\\d+")) fail(s"bad frame rate '$rate'")
    if (chroma != "C444")
      fail(s"chroma '$chroma' (C444 only — subsampled layouts would " +
        "need resample arithmetic this decoder does not implement)")
    Y4mHeader(w, h, 3 * w * h, nl + 1)
  }

  /** Decode a Y4M payload's geometry → (width, height, frameCount),
    * walking and validating every FRAME marker. Strict like the other
    * codecs: bad magic, unknown header parameters, non-C444 chroma, a
    * malformed FRAME line, or a short final frame all throw. */
  def decodeY4m(bytes: Array[Byte]): (Int, Int, Int) = {
    val hd = parseY4mHeader(bytes)
    var n = 0
    val it = y4mFrameIterator(bytes, hd)
    while (it.hasNext) { it.next(); n += 1 }
    (hd.w, hd.h, n)
  }

  /** Iterator of (frameIdx, offset of this frame's Y plane) — frames are
    * validated lazily; only offsets are held, so memory stays bounded by
    * ONE frame regardless of video length. */
  private def y4mFrameIterator(bytes: Array[Byte],
      hd: Y4mHeader): Iterator[(Int, Int)] = new Iterator[(Int, Int)] {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"decodeY4m: $msg")
    private var pos = hd.bodyOff
    private var idx = 0
    def hasNext: Boolean = pos < bytes.length
    def next(): (Int, Int) = {
      // each frame: "FRAME"[ params]"\n" + frameBytes of planar YUV
      if (pos + 5 > bytes.length ||
          new String(bytes, pos, 5,
            java.nio.charset.StandardCharsets.US_ASCII) != "FRAME")
        fail(s"frame $idx: missing FRAME marker at byte $pos")
      var nl = pos + 5
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (nl >= bytes.length) fail(s"frame $idx: unterminated FRAME line")
      if (nl > pos + 5 && bytes(pos + 5) != ' ')
        fail(s"frame $idx: malformed FRAME parameters")
      val dataOff = nl + 1
      if (dataOff + hd.frameBytes > bytes.length)
        fail(s"frame $idx: short frame (need ${hd.frameBytes}, have " +
          s"${bytes.length - dataOff})")
      val out = (idx, dataOff)
      pos = dataOff + hd.frameBytes
      idx += 1
      out
    }
  }

  /** Encode planar C444 frames as a Y4M stream — the sink-side inverse of
    * the frame walk; round-trip is frame-exact. Each frame is 3·w·h bytes:
    * the Y plane, then U, then V. */
  def encodeY4m(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0, s"encodeY4m: bad dimensions ${w}x$h")
    frames.foreach(f => require(f.length == 3 * w * h,
      s"encodeY4m: frame length ${f.length} != ${3 * w * h}"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    frames.foreach { f =>
      out.write("FRAME\n".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      out.write(f)
    }
    out.toByteArray
  }

  /** Deterministic Y4M payload for doc `d` — a REAL multi-frame video
    * stream whose plane bytes follow closed-form arithmetic
    * `(d*23 + f*5 + j) % 256` (f = frame index, j = linear offset within
    * the frame's 3 planes), so a SQL oracle predicts per-frame plane sums
    * with no decoder. Frame counts 3..6 ensure stride sampling has
    * something to skip. */
  def syntheticY4m(d: Long): Array[Byte] = {
    val w = (3 + d % 3).toInt
    val h = (2 + d % 3).toInt
    val nFrames = (3 + d % 4).toInt
    encodeY4m(w, h, (0 until nFrames).map(f =>
      Array.tabulate(3 * w * h)(j => ((d * 23 + f * 5 + j) % 256).toByte)))
  }

  /** Y4M corpus with PLANTED near-dup families for video fingerprint
    * dedup (q204) — the video twin of [[syntheticWavFamily]]: doc `d`
    * shares a pseudo-random per-frame luma pattern with every sibling of
    * its family `d % 63` (the f² term breaks ramp degeneracy exactly as
    * the WAV k² term does), plus a per-doc jitter of 0–4 added to pixel
    * 0 of each frame's Y plane. Pixel 0's base is taken mod 250 so the
    * jitter can NEVER wrap the byte (a wrap would swing the frame sum by
    * −250 and turn a near-dup into a far pair); other pixels use the
    * full mod 256. Consecutive frame-luma-sum gaps are spread over
    * ~±1500, so the ≤4 jitter flips a sign-of-derivative bit only when
    * a family gap lands within ±8 (≲0.3% per bit → expected hamming ≪ 1
    * inside a family, ~16 across families). 4×3, 33 frames → a 32-bit
    * derivative fingerprint; chroma planes carry per-doc arithmetic
    * irrelevant to the fingerprint (decode still walks them). */
  def syntheticY4mFamily(d: Long): Array[Byte] = {
    val w = 4
    val h = 3
    val fam = d % 63
    val frames = (0 until 33).map { f =>
      Array.tabulate(3 * w * h) { j =>
        if (j < w * h) { // Y plane
          val base = fam * 2654435761L + f.toLong * f * 2246822519L +
            f * 40503L + j * 97L
          if (j == 0) (base % 250 + (d * 13 + f * 7) % 5).toByte
          else (base % 256).toByte
        } else ((d * 23 + f * 5 + j) % 256).toByte // U/V planes
      }
    }
    encodeY4m(w, h, frames)
  }

  /** Coarse video fingerprint over decoded Y4M payloads: bit i is the
    * SIGN OF THE FRAME-LUMA-SUM DERIVATIVE (sumY(i+1) > sumY(i) over the
    * first `frames` frames) — [[y4mSceneCuts]]' luma-delta signal
    * coarsened to a fixed-width signature, integer-exact end to end.
    * Equal-width strings feed [[graft.dedup.Dedup.simhashPairs]]' banded
    * near-dup search unchanged — video joins text (MinHash), embeddings
    * (cosine), images (dHash), and audio (WAV energy derivative) on the
    * same candidate-pair machinery, completing the modality matrix.
    * Frames stream through the offset iterator (one plane live at a
    * time). Strict: fewer than `frames` frames fails loudly. */
  def y4mFingerprints(ds: Dataset[MediaFile], frames: Int = 33)
      : Dataset[Y4mFingerprint] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val hd = parseY4mHeader(m.payload)
      val planeLen = hd.w * hd.h
      val sums = y4mFrameIterator(m.payload, hd)
        .take(frames)
        .map { case (_, off) =>
          var sy = 0L
          var j = 0
          while (j < planeLen) {
            sy += m.payload(off + j) & 0xff
            j += 1
          }
          sy
        }.toArray
      require(sums.length >= frames,
        s"y4mFingerprints: need >= $frames frames, got ${sums.length} " +
          s"for doc ${m.docId}")
      val bits = new StringBuilder(frames - 1)
      var i = 1
      while (i < frames) {
        bits.append(if (sums(i) > sums(i - 1)) '1' else '0')
        i += 1
      }
      Y4mFingerprint(m.docId, bits.toString)
    })
  }

  /** REAL decoder factory over [[decodeY4m]] — (w, h, frameCount) fills
    * the shared envelope, so the generic [[sampleFrames]] fan-out runs on
    * genuine video geometry. */
  val y4mDecoder: DecoderFactory = () => { bytes =>
    decodeY4m(bytes)
  }

  /** Per-plane sums for every `every`-th frame — video's integer-exact
    * sibling of [[ppmPixelStats]]: the 1:N decode-and-sample shape, one
    * output row per SAMPLED frame. Skipped frames are never touched
    * beyond the marker walk, and only one frame's planes are live at a
    * time (the iterator holds offsets, not frames). */
  def y4mFrameStats(ds: Dataset[MediaFile], every: Int): Dataset[FrameStats] = {
    require(every > 0, s"frame stride `every` must be positive, got $every")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { m =>
        val hd = parseY4mHeader(m.payload)
        val planeLen = hd.w * hd.h
        y4mFrameIterator(m.payload, hd)
          .filter { case (f, _) => f % every == 0 }
          .map { case (f, off) =>
            var sy = 0L; var su = 0L; var sv = 0L
            var j = 0
            while (j < planeLen) {
              sy += m.payload(off + j) & 0xff
              su += m.payload(off + planeLen + j) & 0xff
              sv += m.payload(off + 2 * planeLen + j) & 0xff
              j += 1
            }
            FrameStats(m.docId, f, hd.w, hd.h, sy, su, sv)
          }
      }
    }
  }

  /** Scene-cut detection over Y4M payloads: a CUT between consecutive
    * frames wherever the absolute luma-sum delta exceeds `threshold` —
    * the temporal-segmentation primitive of video curation (sample one
    * frame per shot instead of per stride; luma-delta thresholding is
    * the classic first-pass detector). Integer-exact: per-frame Y-plane
    * sums accumulate in longs, the delta compare has no float anywhere,
    * so a SQL oracle replays every cut decision. One row per document:
    * (doc, n_frames, n_cuts, cuts_digest) — the digest pins the exact
    * cut SET (frame indices where a cut PRECEDES the frame). Frames
    * stream through the offset iterator; only one frame's planes plus
    * one running sum are live at a time. */
  def y4mSceneCuts(ds: Dataset[MediaFile],
      threshold: Long): Dataset[SceneCuts] = {
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val hd = parseY4mHeader(m.payload)
        val planeLen = hd.w * hd.h
        var prev = -1L
        var n = 0
        val cuts = Seq.newBuilder[Int]
        y4mFrameIterator(m.payload, hd).foreach { case (f, off) =>
          var sy = 0L
          var j = 0
          while (j < planeLen) {
            sy += m.payload(off + j) & 0xff
            j += 1
          }
          if (f > 0 && math.abs(sy - prev) > threshold) cuts += f
          prev = sy
          n += 1
        }
        val cs = cuts.result()
        SceneCuts(m.docId, n, cs.length,
          md5Hex(cs.mkString(",").getBytes(
            java.nio.charset.StandardCharsets.US_ASCII)))
      }
    }
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

/** Frame-energy-derivative sign bits for one audio payload — the audio
  * near-dup (q181) fingerprint path. */
case class WavFingerprint(doc_id: Long, fingerprint: String)

/** Frame-luma-sum-derivative sign bits for one video payload — the video
  * near-dup (q204) fingerprint path. */
case class Y4mFingerprint(doc_id: Long, fingerprint: String)

/** Decoded per-plane sums (integer-exact) for one SAMPLED video frame —
  * the Y4M (q142) decode path: one row per kept frame. */
case class FrameStats(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    sum_y: Long, sum_u: Long, sum_v: Long)

/** Per-channel audio features (integer-exact) — the WAV feature path
  * (q150): one row per (doc, channel). */
case class WavChannelFeats(doc_id: Long, ch: Int, n_frames: Int,
    zcr: Long, energy: Long)

/** Scene-cut report (integer-exact) for one video payload — the Y4M
  * temporal-segmentation path (q157). */
case class SceneCuts(doc_id: Long, n_frames: Int, n_cuts: Int,
    cuts_digest: String)

/** Silence-trim boundaries (integer-exact) for one audio payload — the
  * WAV trim path (q159): first/last loud frame, −1/−1 when all-silent. */
case class WavTrim(doc_id: Long, n_frames: Int, first_loud: Int,
    last_loud: Int, n_kept: Int)
