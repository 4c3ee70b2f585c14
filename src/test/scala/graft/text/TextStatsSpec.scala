package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TextStatsSpec extends AnyFunSuite with SparkTestBase {

  test("winnowing guarantee: shared substring >= k+w-1 chars -> shared fp") {
    import spark.implicits._
    val shared = "a quick brown fox jumped over it" // >> 11 chars normalized
    val docs = Seq(
      (1L, s"first document begins here $shared and then diverges totally"),
      (2L, s"unrelated opening text $shared closing words differ"),
      (3L, "nothing in common with the others at all, completely disjoint"))
      .toDF("doc_id", "text")
    val fps = TextStats.winnowing(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must share a fp")
    // winnowing compresses: fewer fingerprints than k-gram positions
    assert(fps(1L).size < docs.where($"doc_id" === 1L).head.getString(1)
      .replaceAll("[^a-z0-9]+", "").length - 7)
  }

  test("short documents produce empty fingerprint sets, not errors") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("doc_id", "text")
    val fps = TextStats.winnowing(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).isEmpty && fps(2L).isEmpty)
  }

  test("langId argmax is deterministic and matches marker dominance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog went to that house in the garden"),
      (2L, "der hund und die katze das ist nicht gut"),
      (3L, "le chat et les chiens des animaux une maison est grande"))
      .toDF("doc_id", "text")
    val out = TextStats.langId(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted_lang")).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("bm25: rare terms outrank common, tf saturates, length penalizes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare signal here"),                      // 1x rare term
      (2L, "common word and common word again"),     // 2x common term
      (3L, "common " * 30),                          // 30x common: saturation
      (4L, "rare signal " + "padding filler " * 40), // rare but long doc
      (5L, "nothing relevant at all")                // no query token
    ).toDF("doc_id", "text")
    val out = TextStats
      .bm25(docs, queryTokens = Seq("rare", "common"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // docs without any query token are absent (inverted-index semantics)
    assert(!out.contains(5L))
    // equal idf (both terms have df=2 of 5): the SHORT rare doc must beat
    // the LONG rare doc — length normalization
    assert(out(1L)._2 > out(4L)._2)
    // tf saturation: 30x occurrences score < 15x the 2x-occurrence doc
    assert(out(3L)._2 < out(2L)._2 * 15)
    // but more occurrences still score higher at similar length
    assert(out(2L)._2 > 0 && out(1L)._2 > 0)
    assert(out(1L)._1 === 1L && out(4L)._1 === 1L)
  }

  test("bigramLmScore matches a hand-computed add-one bigram model") {
    import spark.implicits._
    // corpus: "a b" x2, "a c", "solo" — vocabulary {a, b, c, solo} (V=4;
    // the bigram-less doc still contributes its unigram), unigram count
    // a=3; bigram counts (a,b)=2, (a,c)=1
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "solo")) // single token: no bigrams, must be absent
      .toDF("doc_id", "text")
    val out = TextStats.bigramLmScore(docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    assert(!out.contains(4L))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // P(b|a) = (2+1)/(3+4) = 3/7 ; P(c|a) = (1+1)/(3+4) = 2/7
    assert(out(1L) === (1L, r6(math.log(3.0 / 7))))
    assert(out(2L) === (1L, r6(math.log(3.0 / 7))))
    assert(out(3L) === (1L, r6(math.log(2.0 / 7))))
    // the corpus-typical bigram scores strictly higher than the rare one
    assert(out(1L)._2 > out(3L)._2)
  }

  test("charEntropy: 0 for single-char spam, ln 2 for a two-symbol " +
      "coin, case-folded, round-6") {
    import spark.implicits._
    val out = TextStats.charEntropy(Seq(
      (1L, "aaaaaaaa"),
      (2L, "abababab"),
      (3L, "AbAbAbAb")) // case folds onto doc 2's distribution
      .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((8L, 1L, 0.0)))
    assert(out(2L)._3 === math.BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(3L) === out(2L))
  }
}
