package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("vocabulary counts words across documents, case-folded") {
    val docs = Seq("The cat the CAT", "cat hat").toDF("text")
    val v = Bpe.vocabulary(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("the" -> 2L, "cat" -> 3L, "hat" -> 1L))
  }

  test("pairStats counts frequency-weighted overlapping pairs") {
    // vocabulary: "aab" x2, "ab" x1, "c" x1 (no pairs from length-1)
    val docs = Seq("aab ab", "aab c").toDF("text")
    val p = Bpe.pairStats(docs, topK = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aab" pairs: aa, ab; "ab" pairs: ab
    assert(p === Map("aa" -> 2L, "ab" -> 3L))
  }

  test("repeated pair within one word counts every occurrence") {
    val docs = Seq("aaaa").toDF("text") // pairs: aa, aa, aa
    val p = Bpe.pairStats(docs, topK = 10).collect()
    assert(p.length === 1)
    assert(p.head.getString(0) === "aa" && p.head.getLong(1) === 3L)
  }

  test("topK ranks by count desc, then pair asc — deterministic ties") {
    // xy and yz both appear once; lexicographic order breaks the tie
    val docs = Seq("xy yz").toDF("text")
    val rows = Bpe.pairStats(docs, topK = 1).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("xy"))
  }

  test("trainMerges learns multi-char symbols across steps") {
    // "abab" x2, "ab" x1: step1 merges (a,b) cnt 5; step2 merges
    // (ab,ab) cnt 2 — the pair of the NEW symbol
    val docs = Seq("abab ab", "abab").toDF("text")
    val m = Bpe.trainMerges(docs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "b", 5L), (2, "ab", "ab", 2L)))
  }

  test("trainMerges: the marker anchors merges at symbol boundaries") {
    // merging (a,b) must not touch "ba"'s CHAR-adjacent b,a — after
    // step1 "ba" still pairs as (b,a)
    val docs = Seq("ab ab ba").toDF("text")
    val m = Bpe.trainMerges(docs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "b", 2L), (2, "b", "a", 1L)))
  }

  test("trainMerges: leftmost non-overlapping = greedy BPE pairing") {
    // "aaaa": step1 (a,a) cnt 3 → "|aa|aa" (NOT "|aa|a|a");
    // step2 (aa,aa) cnt 1; step3 exhausts — 2 rows, early stop
    val docs = Seq("aaaa").toDF("text")
    val m = Bpe.trainMerges(docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("encode applies merges in learned order, per document") {
    val docs = Seq((1L, "abab cd"), (2L, "ba"), (3L, "...")).toDF("doc_id", "text")
    // merges (a,b) then (ab,ab): "abab"→1 sym, "cd"→2, "ba"→2
    val r = Bpe.encode(docs, Seq(("a", "b"), ("ab", "ab"))).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    // doc 3 has no tokens and is dropped
    assert(r.toSeq === Seq((1L, 2L, 3L), (2L, 1L, 2L)))
  }

  test("encode with no merges counts characters") {
    val docs = Seq((1L, "abc de")).toDF("doc_id", "text")
    val r = Bpe.encode(docs, Seq.empty).collect().head
    assert((r.getLong(1), r.getLong(2)) === (2L, 5L))
  }
}
