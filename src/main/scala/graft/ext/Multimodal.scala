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
  * STUB NOTE: this container has no media libraries, so the default decoder
  * is a clearly-marked deterministic fake deriving dimensions from the
  * payload digest. The partitioning, schema, typed Dataset plumbing and the
  * per-partition decoder lifecycle are real and tested; swap `stubDecoder`
  * for a JNI/codec-backed function in production.
  */
object Multimodal {

  /** (width, height, frames) from payload bytes. */
  type Decoder = Array[Byte] => (Int, Int, Int)

  /** Deterministic fake: dimensions from the md5 hex of the payload —
    * matches the expression-level stub in q29_multimodal_meta so the typed
    * path and the SQL path cross-check each other. */
  val stubDecoder: Decoder = { bytes =>
    val hex = md5Hex(bytes)
    val w = hex(0).toInt * 8 + hex(1).toInt
    val h = hex(2).toInt * 8 + hex(3).toInt
    (w, h, bytes.length / 100 + 1)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Decode + feature-extract per partition. The decoder is created once
    * per partition (a real codec holds native buffers); rows stream through
    * an iterator — no materialization of the partition. */
  def decodeMeta(ds: Dataset[MediaFile],
      decoder: Decoder = stubDecoder): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init point for heavyweight decoders
      val dec = decoder
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
    * implementation swaps `resizer` for a codec call. The envelope records
    * the new dimensions so downstream stages never re-decode. */
  def resize(ds: Dataset[MediaFile], w: Int, h: Int,
      resizer: (Array[Byte], Int, Int) => Array[Byte] = stubResizer)
      : Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val rs = resizer // per-partition init point
      it.map { m =>
        val out = rs(m.payload, w, h)
        MediaMeta(m.docId, m.kind, out.length, w, h, 1, md5Hex(out))
      }
    }
  }

  val stubResizer: (Array[Byte], Int, Int) => Array[Byte] = { (bytes, w, h) =>
    val n = math.max(1, w * h / 64)
    val seed = MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(n)(i => seed(i % seed.length))
  }

  /** One row per sampled frame — the 1:N fan-out batch shape (video →
    * frames). Frame payloads derive deterministically from (payload,
    * frameIdx); `every` controls the stride. flatMap streams frames out of
    * the iterator, so a long video never materializes in memory at once. */
  def sampleFrames(ds: Dataset[MediaFile], every: Int,
      decoder: Decoder = stubDecoder): Dataset[FrameSample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { m =>
      val (_, _, nFrames) = decoder(m.payload)
      (0 until nFrames by every).map { f =>
        FrameSample(m.docId, f,
          md5Hex(m.payload ++ BigInt(f).toByteArray))
      }
    }
  }
}

/** One sampled frame: parent doc, frame index, frame digest (the stub's
  * stand-in for decoded frame bytes). */
case class FrameSample(docId: Long, frameIdx: Int, frameDigest: String)
