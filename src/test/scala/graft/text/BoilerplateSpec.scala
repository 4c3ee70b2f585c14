package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BoilerplateSpec extends AnyFunSuite with SparkTestBase {

  private def extract(pages: Seq[(Long, String)])
      : Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    Boilerplate.extractMain(pages.toDF("doc_id", "page"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("link-dense chrome drops, prose keeps, order preserved") {
    val page = Seq(
      "<html>", // tag-only: no text, dropped
      "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>",
      "<p>alpha beta gamma delta</p>", // plain prose: kept
      // inline link, anchor 5 of 24 chars: kept
      "<p>see the <a href=\"/x\">docs</a> for details</p>",
      // ad strip: a <p>, but anchors are 6 of 7 chars: dropped
      "<p><a href=\"/buy\">Buy</a> <a href=\"/now\">now</a></p>",
      "<p>closing line</p>",
      "<footer><a href=\"/p\">Privacy</a> <a href=\"/t\">Terms</a></footer>",
      "</html>").mkString("\n")
    val (main, kept, dropped) = extract(Seq((1L, page)))(1L)
    assert(main === Seq("alpha beta gamma delta",
      "see the docs for details", "closing line").mkString("\n"))
    assert(kept === 3L)
    assert(dropped === 5L)
  }

  test("density is content-based: the same tag flips with anchor share") {
    // exactly half anchored (10 of 20 chars incl. space): kept at <= 0.5
    val half = "<p><a>aaaaaaaaaa</a> bbbbbbbbb</p>"
    // anchor majority: dropped
    val most = "<p><a>aaaaaaaaaaaaaaa</a> bbbb</p>"
    val got = extract(Seq((1L, Seq(half, most).mkString("\n"))))(1L)
    assert(got._1 === "aaaaaaaaaa bbbbbbbbb")
    assert(got._2 === 1L && got._3 === 1L)
  }

  test("nested markup inside an anchor counts as anchor text") {
    // real-crawl soup: the ad strip's anchors wrap <b>/<span> — the old
    // flat regex ([^<]*) measured 0 anchor chars and KEPT the strip
    val ad = "<p><a href=\"/buy\"><b>Buy</b></a> <a><span>now</span></a></p>"
    // prose line whose one link wraps a <b>: anchor 4 of 24, kept
    val prose = "<p>see the <a href=\"/x\"><b>docs</b></a> for details</p>"
    val got = extract(Seq((1L, Seq(ad, prose).mkString("\n"))))(1L)
    assert(got._1 === "see the docs for details")
    assert(got._2 === 1L && got._3 === 1L)
  }

  test("a page of pure chrome extracts to empty text, counts honest") {
    val page = Seq(
      "<nav><a href=\"/\">x</a></nav>",
      "<footer><a href=\"/\">y</a></footer>").mkString("\n")
    val (main, kept, dropped) = extract(Seq((7L, page)))(7L)
    assert(main === "")
    assert(kept === 0L)
    assert(dropped === 2L)
  }
}
