package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UrlsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def extract(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(Urls.extractUrls(col("text")).as("us"))
      .collect().head.getSeq[String](0)

  test("extracts http and https links, document order, case-folded") {
    assert(extract("see HTTP://A.example.COM/x and https://b.net end") ===
      Seq("http://a.example.com/x", "https://b.net"))
  }

  test("scheme-less hosts, ftp, and mailto do NOT match") {
    assert(extract("www.bare.com ftp://files.skip.me/x mailto:a@b.com")
      === Seq.empty)
  }

  test("path charset is conservative: the match stops at a quote") {
    assert(extract("""href="https://a.b.co/p?q=1" tail""") ===
      Seq("https://a.b.co/p?q=1"))
  }

  test("host and registeredDomain parse the planted shapes") {
    val r = Seq("https://cdn.assets-1.net/f?id=9").toDF("u")
      .select(Urls.host(col("u")).as("h"),
        Urls.registeredDomain(Urls.host(col("u"))).as("d"))
      .collect().head
    assert(r.getString(0) === "cdn.assets-1.net")
    assert(r.getString(1) === "assets-1.net")
    val bare = Seq("http://single").toDF("u")
      .select(Urls.registeredDomain(Urls.host(col("u")))).collect().head
    assert(bare.getString(0) === "") // single-label host: no registered domain
  }
}
