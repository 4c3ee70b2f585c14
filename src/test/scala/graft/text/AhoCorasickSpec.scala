package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase

/** Brute-force occurrence count of `p` in `t` — every start position,
  * overlapping included. The ground truth the automaton must match. */
object AcBrute {
  def count(t: String, p: String): Long =
    (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0,
      p.length)).toLong
}

/** ScalaCheck: the automaton's counts equal brute force for EVERY pattern
  * on adversarial low-alphabet text — including SELF-overlapping patterns
  * ("aa" in "aaa" is 2 hits) and patterns nested in each other ("a" ⊂
  * "ab" ⊂ "bab"), the semantics the SQL replace-count oracle cannot
  * express (q170 restricts its lexicon to border-free words for that
  * reason; this property is the stronger gate). */
object AhoCorasickProps extends Properties("AhoCorasick") {

  private val patterns =
    Seq("a", "b", "aa", "ab", "aba", "bab", "aab", "bb")

  private val text: Gen[String] =
    Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  property("counts == brute force, overlapping + nested + self-overlap") =
    forAll(text) { t =>
      val ac = AhoCorasick.build(patterns)
      val counts = ac.countAll(t)
      patterns.indices.forall(i =>
        counts(i) == AcBrute.count(t, patterns(i)))
    }

  property("longer mixed-alphabet lexicon agrees with brute force") =
    forAll(Gen.choose(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y', 'z', ' ')).map(_.mkString))) { t =>
      val lex = Seq("x", "xy", "yx", "zz", "xyz", "zy x", " ", "yy")
      val counts = AhoCorasick.build(lex).countAll(t)
      lex.indices.forall(i => counts(i) == AcBrute.count(t, lex(i)))
    }
}

class AhoCorasickSpec extends AnyFunSuite with SparkTestBase {

  test("classic hers/his/she/he: all overlapping matches found") {
    val lex = Seq("he", "she", "his", "hers")
    val counts = AhoCorasick.build(lex).countAll("ushers his")
    // "ushers": she@1, he@2, hers@2; "his"@7 with he... "his" has no he.
    assert(counts.toSeq === Seq(1L, 1L, 1L, 1L))
  }

  test("build rejects empty/duplicate lexicons loudly") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
  }

  test("tagCounts: distributed tagging matches per-doc brute force and " +
      "emits only n > 0 rows (q170's contract)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the art of data the"),
      (2L, "partly parted"),
      (3L, "zzz nothing here matches"), // "he" in "here"!
      (4L, "")).toDF("doc_id", "text")
    val lex = Seq("a", "art", "data", "he", "row", "scan", "table", "the")
    val got = AhoCorasick.tagCounts(docs, lex).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val texts = Map(1L -> "the art of data the", 2L -> "partly parted",
      3L -> "zzz nothing here matches", 4L -> "")
    val want = (for {
      (d, t) <- texts.toSeq; p <- lex
      n = AcBrute.count(t, p) if n > 0
    } yield (d, p) -> n).toMap
    assert(got === want)
    // the overlap pairs really fired: "he" hits inside "the"s of doc 1
    assert(got((1L, "he")) === 2 && got((1L, "the")) === 2)
    assert(got((2L, "art")) === 2) // inside partly/parted
  }
}
