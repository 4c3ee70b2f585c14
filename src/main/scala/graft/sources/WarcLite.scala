package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-style web-archive corpus source/sink — the ingest format of web
  * crawls (ISO 28500; Common Crawl publishes exactly this shape: a
  * directory of bounded-size `.warc` files, each a concatenation of
  * records with `\r\n` header lines, a `Content-Length`-framed payload,
  * and a blank-line separator). This is a self-contained lite profile of
  * that grammar: four headers we control, byte-exact length framing, and
  * the same drop-don't-fail contract as [[Sources.readJsonl]] (O2's
  * malformed-input rule, reference StreamingJob.java:67-77) — a record
  * with a corrupt header, an unparseable id, or a truncated payload is
  * skipped and the scanner RESYNCS on the next `WARC/1.0` version line,
  * so one bad record never poisons the rest of its file.
  *
  * Scale shape: the unit of parallelism is the FILE (one task per
  * archive, the Common Crawl layout — ~1 GB per file, thousands of files
  * per crawl), via `sparkContext.binaryFiles`, whose
  * `PortableDataStream` is opened lazily per task. The parser walks the
  * stream record-at-a-time, so task memory is bounded by the largest
  * single record, never the file. Payload framing is by byte count, so
  * document text may contain anything — including blank lines and
  * strings that look like WARC headers. */
object WarcLite {

  private val Version = "WARC/1.0"

  /** Writes `docs` (doc_id, text, lang, source) as WARC-lite archive
    * files, one file per partition — callers size partitions to the
    * archive-file budget. Record layout (headers `\r\n`-terminated, the
    * payload framed by its UTF-8 byte length):
    *
    * {{{
    * WARC/1.0
    * WARC-Record-ID: <doc_id>
    * WARC-Target-URI: graft://<source>/<doc_id>
    * Content-Language: <lang>
    * Content-Length: <n>
    *
    * <payload bytes>
    * <blank separator line>
    * }}}
    *
    * Emitted through the text sink: the record (with embedded `\r\n`s)
    * is one row value, written verbatim; the sink's trailing `\n`
    * completes the separator. A pure map stage — embarrassingly
    * parallel, no shuffle. */
  def writeWarcLite(docs: DataFrame, path: String): Unit =
    docs
      .select(concat(
        lit(Version + "\r\n"),
        lit("WARC-Record-ID: "), col("doc_id").cast("string"), lit("\r\n"),
        lit("WARC-Target-URI: graft://"), col("source"), lit("/"),
        col("doc_id").cast("string"), lit("\r\n"),
        lit("Content-Language: "), col("lang"), lit("\r\n"),
        lit("Content-Length: "),
        octet_length(col("text").cast("binary")).cast("string"),
        lit("\r\n\r\n"),
        col("text"), lit("\r\n")).as("value"))
      .write.mode("overwrite").text(path)

  /** Parsed archive as (doc_id, text, lang, source); malformed records
    * dropped, scanner resynced per the class contract. `minPartitions`
    * only matters when the directory has fewer files than cores. */
  def readWarcLite(spark: SparkSession, path: String,
      minPartitions: Int = 1): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path, minPartitions)
      // _SUCCESS / hidden markers: zero records, but skip the open
      .filter { case (name, _) =>
        val base = name.substring(name.lastIndexOf('/') + 1)
        !base.startsWith("_") && !base.startsWith(".")
      }
      .flatMap { case (_, pds) => records(pds.open()) }
      .toDF("doc_id", "text", "lang", "source")
  }

  /** Record-at-a-time scanner over one archive stream. Lazy: the
    * iterator owns the stream and closes it on exhaustion. */
  private[sources] def records(
      in: InputStream): Iterator[(Long, String, String, String)] = {
    val buf = new BufferedInputStream(in, 1 << 16)
    new Iterator[(Long, String, String, String)] {
      private var nextRec: (Long, String, String, String) = _
      private var done = false

      private def advance(): Unit = {
        while (nextRec == null && !done) {
          // resync: scan forward to the next version line
          line(buf) match {
            case null => done = true; buf.close()
            case Version => nextRec = record(buf).orNull
            case _ => () // garbage between records — keep scanning
          }
        }
      }
      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): (Long, String, String, String) = {
        advance()
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** One record body (the version line is already consumed). None ⇒
    * malformed; the stream is left wherever the failure was detected and
    * the caller's resync scan takes over. */
  private def record(
      in: BufferedInputStream): Option[(Long, String, String, String)] =
    try {
      var id: Option[Long] = None
      var lang, source: String = null
      var len: Option[Int] = None
      var l = line(in)
      while (l != null && l.nonEmpty) {
        val c = l.indexOf(": ")
        if (c < 0) return None // not a header line — malformed
        val (k, v) = (l.substring(0, c), l.substring(c + 2))
        k match {
          case "WARC-Record-ID" => id = v.toLongOption
          case "Content-Language" => lang = v
          case "Content-Length" => len = v.toIntOption.filter(_ >= 0)
          case "WARC-Target-URI" =>
            val s = v.stripPrefix("graft://")
            val slash = s.lastIndexOf('/')
            if (slash >= 0) source = s.substring(0, slash)
          case _ => () // unknown headers are legal WARC — ignore
        }
        l = line(in)
      }
      if (l == null) return None // EOF inside headers
      (id, len) match {
        case (Some(i), Some(n)) if lang != null && source != null =>
          val payload = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(payload, off, n - off)
            if (r < 0) throw new EOFException("truncated payload")
            off += r
          }
          Some((i, new String(payload, UTF_8), lang, source))
        case _ => None // missing/corrupt required header
      }
    } catch { case _: EOFException => None }

  /** Reads one `\n`-terminated line (CR stripped) as ISO-8859-1 — header
    * bytes only; payloads never go through here. Null at EOF. */
  private def line(in: BufferedInputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r')
      sb.setLength(sb.length - 1)
    sb.toString
  }
}
