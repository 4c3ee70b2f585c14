package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TfidfSpec extends AnyFunSuite with SparkTestBase {

  private def pairs(docs: Seq[(Long, String)], dfCap: Int = 20) = {
    import spark.implicits._
    Dedup.tfidfPairs(docs.toDF("doc_id", "text"), dfCap = dfCap)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
  }

  test("identical docs score cosine 1; disjoint docs never pair") {
    val p = pairs(Seq(
      (1L, "quartz vulture matrix"), (2L, "quartz vulture matrix"),
      (3L, "onyx gecko prism")))
    assert(math.abs(p((1L, 2L)) - 1.0) < 1e-12)
    assert(!p.contains((1L, 3L)) && !p.contains((2L, 3L)))
  }

  test("word-order scramble keeps cosine at 1 (the anti-shingle case)") {
    // every 3-gram differs, the word multiset is identical — the shingle
    // family scores this pair low; the vector-space detector must not.
    // Filler docs keep df < n so the shared words carry nonzero idf.
    val p = pairs(Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "foxtrot echo delta charlie bravo alpha"),
      (3L, "filler words here"), (4L, "other filler there")))
    assert(math.abs(p((1L, 2L)) - 1.0) < 1e-12)
  }

  test("all-ubiquitous-words docs drop out instead of dividing by zero") {
    // every word of docs 1-2 appears in ALL docs (df == n → idf 0):
    // their vectors are empty, so they must simply produce no pairs
    val p = pairs(Seq(
      (1L, "common shared"), (2L, "common shared")))
    assert(p.isEmpty)
  }

  test("df cap drops ubiquitous words from vectors and candidates") {
    // 'common' is in every doc; with dfCap=2 it is pruned, so docs
    // sharing ONLY 'common' never become a candidate pair
    val p = pairs(Seq(
      (1L, "common unique1"), (2L, "common unique2"),
      (3L, "common unique3")), dfCap = 2)
    assert(p.isEmpty)
  }

  test("partial overlap lands strictly between 0 and 1") {
    val p = pairs(Seq(
      (1L, "silver copper bronze iron"),
      (2L, "silver copper bronze zinc"),
      (3L, "unrelated vocabulary entirely")))
    val c = p((1L, 2L))
    assert(c > 0.0 && c < 1.0)
  }
}
