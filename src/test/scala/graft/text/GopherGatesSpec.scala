package graft.text

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GopherGatesSpec extends AnyFunSuite with SparkTestBase {

  private def gates(docs: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    TextStats
      .gopherGates(docs.toDF("doc_id", "text"), minWords = 5,
        maxWords = 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("each gate fails on its own violation and passes on prose") {
    val out = gates(
      1L -> "the cat sat on a mat with food for everyone here", // prose: all pass
      2L -> "too few", // word-count floor
      3L -> ("the of a " + Seq.fill(18)("word").mkString(" ")), // count ceiling
      4L -> "a ab of to in is on it we be an so", // mean word len < 3
      5L -> "unselected wordforms lacking stopword presence whatsoever today", // <2 stopwords (has none; 6 words, needs minWords<=6)
      6L -> "the 10 20 30 40 50 60 70 80 of") // alpha fraction 0.2
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("gate_words"))
    assert(!out(3L).getAs[Boolean]("gate_words"))
    assert(!out(4L).getAs[Boolean]("gate_word_len"))
    assert(out(5L).getAs[Int]("n_stop_distinct") === 0)
    assert(!out(5L).getAs[Boolean]("gate_stop"))
    assert(!out(6L).getAs[Boolean]("gate_alpha"))
    assert(out(6L).getAs[Double]("alpha_frac") === 0.2)
    // a failed gate always fails the conjunction
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(!out(id).getAs[Boolean]("pass"), s"doc $id"))
  }

  test("stopword gate counts DISTINCT stopwords, case-insensitively") {
    val out = gates(
      1L -> "The the THE the the word word word word word", // 1 distinct
      2L -> "The cat and A dog with others walking around town") // the,a,with,and
    assert(out(1L).getAs[Int]("n_stop_distinct") === 1)
    assert(!out(1L).getAs[Boolean]("gate_stop"))
    assert(out(2L).getAs[Int]("n_stop_distinct") === 4)
    assert(out(2L).getAs[Boolean]("gate_stop"))
  }

  test("empty and whitespace-only documents fail ratio gates, not error") {
    val out = gates(1L -> "", 2L -> "   ")
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Int]("n_words") === 0)
      assert(!out(id).getAs[Boolean]("gate_word_len"), s"doc $id")
      assert(!out(id).getAs[Boolean]("gate_alpha"), s"doc $id")
      assert(!out(id).getAs[Boolean]("pass"), s"doc $id")
    }
  }

  test("measurements: word split collapses runs of whitespace") {
    val out = gates(1L -> "one  two\tthree   four five six")
    assert(out(1L).getAs[Int]("n_words") === 6)
    // (3+3+5+4+4+3)/6 = 22/6
    assert(out(1L).getAs[Double]("mean_word_len") === 3.666667)
  }
}
