package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Dedup as a library: the primitives run on any frame (caller-named id
  * column, synthetic data) and compose into the find-candidates → verify →
  * cluster pipeline with known ground truth. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      (10L, base),
      (11L, base + " again"), // near-dup of 10
      (12L, base.replace("quick", "swift")), // near-dup of 10
      (20L, "completely different text about spark engines and distributed joins with partitions"),
      (21L, "completely different text about spark engines and distributed joins with partitions indeed"), // near-dup of 20
      (30L, "short text"), // < 3 tokens after nothing — actually 2 tokens: no shingles
      (31L, "one two three four five six seven eight nine ten eleven twelve unrelated entirely")
    ).toDF("item_id", "body")
  }

  test("shingles respect caller column names and minimum length") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body")
    assert(g.columns.toSeq === Seq("item_id", "grams"))
    val byId = g.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(30L).isEmpty) // 2 tokens -> no 3-grams
    assert(byId(10L).nonEmpty)
    assert(byId(10L).head.split(" ").length === 3)
  }

  test("LSH candidates -> exact verify -> clusters finds the planted groups") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body").cache()
    val bands = Dedup.minhashBands(g, idCol = "item_id")
    val cands = Dedup.lshCandidates(bands, idCol = "item_id")
    val verified = Dedup.jaccardVerify(cands, g, idCol = "item_id")
      .where(col("jaccard") >= 0.5)
    val ids = corpus().select(col("item_id"))
    val labels = Dedup.clusters(ids, verified.select(col("id_a"), col("id_b")),
      idCol = "item_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted groups collapse to their minimum member
    assert(labels(10L) === 10L && labels(11L) === 10L && labels(12L) === 10L)
    assert(labels(20L) === 20L && labels(21L) === 20L)
    // singletons stay themselves
    assert(labels(30L) === 30L && labels(31L) === 31L)
  }

  test("shingle simhash separates near-dups from unrelated docs") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body")
    val sim = Dedup.simhash(g, "grams", idCol = "item_id", bits = 32)
    val pairs = Dedup.simhashPairs(sim, idCol = "item_id",
      nBlocks = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((20L, 21L))) // single-word append: tiny hamming
    // unrelated docs never pair
    assert(!pairs.exists { case (a, b) => a / 10 != b / 10 })
  }
}
