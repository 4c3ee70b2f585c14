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

  test("merging (a,b) must NOT fire where b is a PREFIX of a longer " +
      "symbol (the one-sided-marker corruption the wrapped encoding fixes)") {
    // step1 merges (b,c) cnt 6, turning "abc" into symbols [a, bc];
    // step2 merges (a,b) cnt 2 — which must leave [a, bc] UNTOUCHED
    // (the old "|a|b" marker form matched "|a|bc" and corrupted it to
    // [abc], silently destroying the (a,bc) pair); step3 then still
    // finds (a, bc) cnt 1.
    val docs = Seq("bc bc bc bc bc abc ab ab").toDF("text")
    val m = Bpe.trainMerges(docs, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "b", "c", 6L), (2, "a", "b", 2L),
      (3, "a", "bc", 1L)))
  }

  test("trainMergesLocal equals trainMerges row-for-row on the fixture " +
      "corpora and on a real corpus slice") {
    def table(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val fixtures = Seq("abab ab ab abab", "ab ab ba", "aaaa aa",
      "bc bc bc bc bc abc ab ab")
    fixtures.foreach { text =>
      val docs = Seq(text).toDF("text")
      assert(table(Bpe.trainMergesLocal(docs, nMerges = 4)) ===
        table(Bpe.trainMerges(docs, nMerges = 4)), s"fixture '$text'")
    }
    val corpus = graft.queries.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(org.apache.spark.sql.functions.col("text"))
    assert(table(Bpe.trainMergesLocal(corpus, nMerges = 5)) ===
      table(Bpe.trainMerges(corpus, nMerges = 5)))
  }

  test("trainMergesLocal runs at 1000+ merges: counts non-increasing, " +
      "pairs never repeat, encode consumes the table") {
    // the sf0.001 synthetic corpus has ~31 distinct tokens (exhausts at
    // <100 merges), so the DEPTH test runs on a generated vocabulary:
    // 4000 distinct seeded pseudo-words, Zipf-ish frequencies
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh"
    val vocabWords = (0 until 4000).map(_ =>
      (0 until (6 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val corpus = vocabWords.zipWithIndex.map { case (w, i) =>
      (i.toLong, (w + " ") * (1 + 2000 / (i + 1)))
    }.toDF("doc_id", "text")
    val m = Bpe.trainMergesLocal(corpus, nMerges = 1000).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m.length > 100, s"expected a deep merge table, got ${m.length}")
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._4, s"count increased ${a} -> ${b}")
    }
    assert(m.map(x => (x._2, x._3)).distinct.length === m.length,
      "a merged pair re-surfaced — leftmost non-overlapping merge broken")
    // the learned table drives encode AT DEPTH (the native BpeSymCount
    // path — the replace-fold would stack-overflow the Column converter
    // at this table size): token counts shrink vs no merges
    val merges = m.map(x => (x._2, x._3)).toSeq
    val enc = Bpe.encode(corpus, merges)
      .agg(org.apache.spark.sql.functions.sum("n_syms"),
        org.apache.spark.sql.functions.sum("n_words")).collect().head
    val enc0 = Bpe.encode(corpus, Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_syms")).collect().head
    assert(enc.getLong(0) < enc0.getLong(0), "merges must compress")
    assert(enc.getLong(0) >= enc.getLong(1), "a word is >= 1 symbol")
  }

  test("encode's two evaluators agree: the codegen'd replace-fold and " +
      "the native deep-table BpeSymCount produce identical n_syms") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "abab cdcd abcd aabb"), (2L, "aaaa bc abc"),
      (3L, "xyz")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("a", "a"),
      ("b", "c"), ("ab", "ab"))
    val fold = Bpe.encode(docs, merges).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // same table through the native evaluator, via the per-word column
    val native = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.explode(
          graft.dedup.Dedup.tokens(col("text"))).as("w"))
      .select(col("doc_id"), BpeSymCount(merges)(col("w")).as("n"))
      .groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.count("*").as("n_words"),
        org.apache.spark.sql.functions.sum("n").as("n_syms"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fold === native)
    // and the plain-Scala reference agrees word-for-word
    assert(Bpe.symbolCount("abab", merges) === 1) // (a,b)x2 then (ab,ab)
    assert(Bpe.symbolCount("abcd", merges) === 1) // (a,b),(c,d),(ab,cd)
    assert(Bpe.symbolCount("aabb", merges) === 3) // (a,b) once: a,ab,b
    assert(Bpe.symbolCount("aaaa", merges) === 2) // (a,a) pass: aa,aa
  }

  test("trainMergesLocal fails loudly past maxVocab instead of " +
      "truncating the vocabulary") {
    val docs = Seq("one two three four five six").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMergesLocal(docs, nMerges = 1, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
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
