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
  * payload digest. The partitioning, schema, typed Dataset plumbing and the
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

  /** Per-channel pixel sums from decoded PPM rasters — integer-exact
    * (no float accumulation), so an oracle can replay the construction
    * arithmetic bit-for-bit. Decode + accumulate stream per partition. */
  def ppmPixelStats(ds: Dataset[MediaFile]): Dataset[PpmStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, rgb) = decodePpm(m.payload)
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i < rgb.length) {
          r += rgb(i) & 0xff
          g += rgb(i + 1) & 0xff
          b += rgb(i + 2) & 0xff
          i += 3
        }
        PpmStats(m.docId, w, h, r, g, b)
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

/** Decoded-raster channel sums (integer-exact) for one PPM payload. */
case class PpmStats(doc_id: Long, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long)
