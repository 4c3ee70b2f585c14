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
}
