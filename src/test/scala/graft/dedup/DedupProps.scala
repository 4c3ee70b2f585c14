package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property-level guarantees of the sketch operators (driven through the
  * real Spark expressions, small generated corpora). */
class DedupProps extends AnyFunSuite with SparkTestBase {

  private val words =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")

  private def sentence(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  test("identical texts collide in EVERY MinHash band; Jaccard verify = 1") {
    import spark.implicits._
    val docs = (0 until 6).map(i => (i.toLong, sentence(i / 2, 12)))
      .toDF("doc_id", "text") // pairs (0,1),(2,3),(4,5) identical
    val g = Dedup.shingles(docs).cache()
    val bands = Dedup.minhashBands(g)
    val collided = Dedup.lshCandidates(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq((0L, 1L), (2L, 3L), (4L, 5L)).foreach(p =>
      assert(collided.contains(p), s"identical pair $p must collide"))
    val verified = Dedup.jaccardVerify(
      Dedup.lshCandidates(bands), g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Seq((0L, 1L), (2L, 3L), (4L, 5L)).foreach(p =>
      assert(math.abs(verified(p) - 1.0) < 1e-12))
  }

  test("simhash of identical texts is identical; hamming to disjoint is large") {
    import spark.implicits._
    val docs = Seq(
      (1L, sentence(7, 20)), (2L, sentence(7, 20)),
      (3L, "completely different words nowhere overlapping whatsoever " +
        "zebra xylophone quasar nebula"))
      .toDF("doc_id", "text")
    val sim = Dedup.simhash(Dedup.shingles(docs), "grams", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sim(1L) === sim(2L))
    val ham = sim(1L).zip(sim(3L)).count { case (a, b) => a != b }
    assert(ham > 4, s"disjoint docs should differ in many bits, got $ham")
  }

  test("clusters is a partition refinement: idempotent and order-insensitive") {
    import spark.implicits._
    val ids = (0L until 10L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L), (9L, 0L))
      .toDF("doc_a", "doc_b")
    val l1 = Dedup.clusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l2 = Dedup.clusters(ids,
      pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 === l2) // direction of edges is irrelevant
    // component {0,1,2,8,9} -> 0; {5,6} -> 5; singletons self
    assert(l1 === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 0L, 9L -> 0L))
  }
}
