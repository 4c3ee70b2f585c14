package graft.dedup

import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IntraDocDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def md5(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("keeps the FIRST occurrence of each repeated unit, size=2") {
    // units (size 2): [a b] [c d] [a b] [e] — the second [a b] drops
    val docs = Seq((1L, "a b c d A  B e")).toDF("doc_id", "text")
    val r = Dedup.dedupUnitsLocal(docs, size = 2).collect().head
    assert(r.getAs[Int]("n_units") === 4)
    assert(r.getAs[Int]("n_kept") === 3)
    assert(r.getAs[String]("clean_digest") === md5("a b c d e"))
  }

  test("case/whitespace/punctuation differences cannot defeat equality") {
    // tokenization normalizes, so "Foo, BAR!" tiles equal "foo bar"
    val docs = Seq((1L, "Foo, BAR! foo bar baz")).toDF("doc_id", "text")
    val r = Dedup.dedupUnitsLocal(docs, size = 2).collect().head
    assert(r.getAs[Int]("n_units") === 3) // [foo bar][foo bar][baz]
    assert(r.getAs[Int]("n_kept") === 2)
    assert(r.getAs[String]("clean_digest") === md5("foo bar baz"))
  }

  test("a document with no repeats passes through unchanged") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val r = Dedup.dedupUnitsLocal(docs, size = 2).collect().head
    assert(r.getAs[Int]("n_units") === r.getAs[Int]("n_kept"))
    assert(r.getAs[String]("clean_digest") === md5("a b c d e"))
  }

  test("token-less documents yield zero units and the empty digest") {
    val docs = Seq((1L, ".,;:"), (2L, "")).toDF("doc_id", "text")
    val rs = Dedup.dedupUnitsLocal(docs, size = 2).collect()
    rs.foreach { r =>
      assert(r.getAs[Int]("n_units") === 0)
      assert(r.getAs[Int]("n_kept") === 0)
      assert(r.getAs[String]("clean_digest") === md5(""))
    }
  }

  test("the operator is one shuffle-free projection (no Exchange)") {
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val plan = Dedup.dedupUnitsLocal(docs, size = 2)
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"expected a shuffle-free per-row map, found: $exchanges")
  }
}
