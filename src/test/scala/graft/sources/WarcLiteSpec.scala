package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WarcLiteSpec extends AnyFunSuite with SparkTestBase {

  private def rec(id: Long, text: String, lang: String = "en",
      source: String = "web"): String =
    s"WARC/1.0\r\nWARC-Record-ID: $id\r\n" +
      s"WARC-Target-URI: graft://$source/$id\r\n" +
      s"Content-Language: $lang\r\n" +
      s"Content-Length: ${text.getBytes(UTF_8).length}\r\n\r\n$text\r\n"

  private def parse(s: String) =
    WarcLite.records(new ByteArrayInputStream(s.getBytes(UTF_8))).toList

  test("length framing survives payloads with blank lines and fake headers") {
    val tricky = "para one\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nend"
    val out = parse(rec(1, tricky) + rec(2, "plain"))
    assert(out === List((1L, tricky, "en", "web"), (2L, "plain", "en", "web")))
  }

  test("unicode payloads are byte-exact") {
    val t = "héllo wörld — 日本語 ✓"
    assert(parse(rec(5, t)) === List((5L, t, "en", "web")))
  }

  test("malformed records drop and the scanner resyncs") {
    val bad =
      "WARC/1.0\r\nWARC-Record-ID: nope\r\nContent-Language: en\r\n" +
        "WARC-Target-URI: graft://w/1\r\nContent-Length: 2\r\n\r\nhi\r\n" + // bad id
        "garbage line\r\n" +
        "WARC/1.0\r\nno colon here\r\n" + // non-header line
        "WARC/1.0\r\nWARC-Record-ID: 9\r\nContent-Language: fr\r\n" +
        "WARC-Target-URI: graft://news/9\r\nContent-Length: 4\r\n\r\nbonj\r\n" +
        "WARC/1.0\r\nWARC-Record-ID: 10\r\nContent-Language: en\r\n" +
        "WARC-Target-URI: graft://w/10\r\nContent-Length: 500\r\n\r\nshort" // truncated
    assert(parse(bad) === List((9L, "bonj", "fr", "news")))
  }

  test("unknown headers are ignored, missing required headers drop") {
    val extra = "WARC/1.0\r\nWARC-Record-ID: 3\r\nWARC-Date: 2026-01-01\r\n" +
      "WARC-Target-URI: graft://a/3\r\nContent-Language: de\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n"
    val missing = "WARC/1.0\r\nWARC-Record-ID: 4\r\nContent-Length: 2\r\n\r\nxx\r\n"
    assert(parse(extra + missing) === List((3L, "ok", "de", "a")))
  }

  test("spark round-trip over multiple archive files") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nbeta", "en", "web"),
      (2L, "gamma", "fr", "news"),
      (3L, "delta\r\n\r\nepsilon", "de", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("warclite").toString
    try {
      WarcLite.writeWarcLite(docs.repartition(2), s"$dir/crawl")
      val back = WarcLite.readWarcLite(spark, s"$dir/crawl")
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(back.toList === List(
        (1L, "alpha\nbeta", "en", "web"),
        (2L, "gamma", "fr", "news"),
        (3L, "delta\r\n\r\nepsilon", "de", "books")))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
