package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Registry

/** The four independent near-dup detector families — exact n-gram Jaccard,
  * MinHash-LSH + verify, shingle SimHash, and winnowing — must agree on
  * the planted near-duplicates: different sketches, same truth. */
class DetectorAgreementSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String, aCol: String = "doc_a",
      bCol: String = "doc_b") =
    Registry.byName(name).run(spark, dir)
      .select(col(aCol), col(bCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH-verified pairs at threshold == exact Jaccard pairs") {
    val exact = pairs("q26_jaccard_pairs")
    val lsh = Registry.byName("q28_minhash_pairs").run(spark, dir)
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact,
      s"missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("winnowing pairs and simhash pairs recover the Jaccard truth") {
    val exact = pairs("q26_jaccard_pairs")
    val winnow = pairs("q64_winnowing_pairs")
    val simhash = pairs("q58_simhash_shingle_pairs")
    // winnowing measures shared substrings, not shingle-set Jaccard, but
    // the uncapped containment score (shared/min n_fp >= 0.75) separates
    // planted pairs from noise (true pairs sit at 1.0, false candidates
    // below 0.63 — see WinnowTuning): exact agreement
    assert(winnow === exact,
      s"missing=${exact -- winnow} extras=${winnow -- exact}")
    // simhash(hamming<=3) is a high-precision subset (no false positives)
    assert(simhash.subsetOf(exact), s"false positives: ${simhash -- exact}")
    assert(simhash.nonEmpty)
  }

  test("winnowing recovers >DF-cap cliques at sf0.1: all 256 pairs, no FPs") {
    // The scale where near-dup cliques exceed the DF cap (20+members →
    // every shared fingerprint capped away): the LSH-candidate union must
    // carry those pairs to the verify stage. Round-3's fp-only candidates
    // missed 33 of these; the union detector must find every true pair
    // with zero false positives.
    val big = "/root/testdata/sf0.1"
    def bigPairs(name: String) =
      Registry.byName(name).run(spark, big)
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = bigPairs("q26_jaccard_pairs")
    val winnow = bigPairs("q64_winnowing_pairs")
    assert(exact.size >= 200, s"expected the planted sf0.1 truth, got ${exact.size}")
    assert(winnow === exact,
      s"missing=${(exact -- winnow).size} extras=${(winnow -- exact).size}")
  }
}
