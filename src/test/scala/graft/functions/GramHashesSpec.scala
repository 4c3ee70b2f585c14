package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** GramHashes: the rolling double-width hash equals the direct per-gram
  * polynomial sums, packed as h₁·M₂ + h₂. */
class GramHashesSpec extends AnyFunSuite {

  private def direct(s: String, from: Int, k: Int, b: Long, m: Long): Long =
    (0 until k).map(j => (s.charAt(from + j).toLong & 0xffL) *
      BigInt(b).modPow(k - 1 - j, m).toLong % m)
      .foldLeft(0L)((acc, t) => (acc + t) % m)

  test("rolling update matches the direct sum for every gram, both " +
      "components, and the packing decomposes") {
    val s = "thequickbrownfox0jumps1over2the3lazydog4abcdefghij"
    for (k <- Seq(2, 8, 40)) {
      val out = GramHashes.compute(UTF8String.fromString(s), k)
      assert(out.length === s.length - k + 1)
      out.zipWithIndex.foreach { case (h, i) =>
        val h1 = direct(s, i, k, WinnowFingerprints.B, WinnowFingerprints.M)
        val h2 = direct(s, i, k, GramHashes.B2, GramHashes.M2)
        assert(h === h1 * GramHashes.M2 + h2, s"k=$k gram $i")
        assert(h / GramHashes.M2 === h1)
        assert(h % GramHashes.M2 === h2)
      }
    }
  }

  test("equal grams hash equal; the two components never coincide by " +
      "construction on differing grams of a repetitive string") {
    val s = "abcabcabcabcabc"
    val out = GramHashes.compute(UTF8String.fromString(s), 3)
    // "abc" appears at 0,3,6,9,12 — all five equal
    assert(Set(out(0), out(3), out(6), out(9), out(12)).size === 1)
    // the three distinct grams (abc, bca, cab) are pairwise distinct
    assert(Set(out(0), out(1), out(2)).size === 3)
  }
}
