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
}
