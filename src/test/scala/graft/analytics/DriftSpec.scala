package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Drift.psi against hand-computed shares: Laplace smoothing over the
  * fixed domain, empty-bin handling on either side, identity = 0, and
  * the loud out-of-range contract. */
class DriftSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def terms(ref: Seq[Int], cur: Seq[Int], bins: Int)
      : Map[Long, (Long, Long, Double)] =
    Drift.psi(ref.toDF("bin"), cur.toDF("bin"), "bin", bins)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  test("matches the hand-computed smoothed PSI, including a bin empty " +
      "on one side and a bin empty on both") {
    // bins 0..3; ref: {0:2, 1:1}, cur: {0:1, 2:2}; bin 3 empty both
    val got = terms(Seq(0, 0, 1), Seq(0, 2, 2), bins = 4)
    val n = 3.0 + 4 // both sides have 3 rows; +bins smoothing mass
    def p(c: Int) = (c + 1) / n
    for ((b, (nr, nc)) <- Map(0L -> ((2L, 1L)), 1L -> ((1L, 0L)),
        2L -> ((0L, 2L)), 3L -> ((0L, 0L)))) {
      val (gr, gc, term) = got(b)
      assert((gr, gc) === ((nr, nc)), s"counts at bin $b")
      val expect = (p(nr.toInt) - p(nc.toInt)) *
        math.log(p(nr.toInt) / p(nc.toInt))
      assert(math.abs(term - expect) < 1e-15, s"term at bin $b")
    }
    // empty-both bin contributes exactly 0 (p == q after smoothing)
    assert(got(3L)._3 === 0.0)
  }

  test("identical populations give PSI exactly 0 in every bin") {
    val pop = Seq(0, 0, 1, 2, 2, 2)
    assert(terms(pop, pop, bins = 3).values.forall(_._3 === 0.0))
  }

  test("out-of-range, NULL, and fractional bins all fail loudly, " +
      "not silently") {
    intercept[Exception](terms(Seq(0, 5), Seq(0), bins = 4))
    // NULL bin: three-valued logic must not park the row under the NULL
    // group where the spine join would silently drop it
    val withNull = Seq(Some(0), None).toDF("bin")
    intercept[Exception](
      Drift.psi(withNull, Seq(0).toDF("bin"), "bin", 4).collect())
    // fractional bin: 3.7 must not silently truncate into bin 3
    val frac = Seq(0.0, 3.7).toDF("bin")
    intercept[Exception](
      Drift.psi(frac, Seq(0.0).toDF("bin"), "bin", 4).collect())
    // integral-valued doubles are fine
    assert(Drift.psi(Seq(0.0, 3.0).toDF("bin"), Seq(0.0).toDF("bin"),
      "bin", 4).collect().length === 4)
  }

  private def catTerms(ref: Seq[String], cur: Seq[String])
      : Map[String, (Long, Long, Double)] =
    Drift.psiCategorical(ref.toDF("cat"), cur.toDF("cat"), "cat")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  test("categorical PSI matches the integer-coded psi over the sorted " +
      "union dictionary — including a category UNSEEN on one side") {
    // ref: {a:2, b:1}; cur: {a:1, c:2} — b drifted OUT, c drifted IN:
    // both must appear with finite terms, not vanish from the score
    val got = catTerms(Seq("a", "a", "b"), Seq("a", "c", "c"))
    assert(got.keySet === Set("a", "b", "c"))
    val n = 3.0 + 3 // 3 rows each side + 3 categories of smoothing mass
    def p(c: Int) = (c + 1) / n
    for ((cat, (nr, nc)) <- Map("a" -> ((2L, 1L)), "b" -> ((1L, 0L)),
        "c" -> ((0L, 2L)))) {
      val (gr, gc, term) = got(cat)
      assert((gr, gc) === ((nr, nc)), s"counts at $cat")
      val expect = (p(nr.toInt) - p(nc.toInt)) *
        math.log(p(nr.toInt) / p(nc.toInt))
      assert(math.abs(term - expect) < 1e-15, s"term at $cat")
    }
    // identical mixes score exactly 0
    assert(catTerms(Seq("x", "y"), Seq("x", "y"))
      .values.forall(_._3 === 0.0))
  }

  test("categorical PSI guards: NULL category, constant column, and " +
      "the identifier-not-category cap all fail loudly") {
    intercept[Exception](
      Drift.psiCategorical(Seq(Some("a"), None).toDF("cat"),
        Seq("a").toDF("cat"), "cat").collect())
    intercept[IllegalArgumentException](
      catTerms(Seq("a", "a"), Seq("a")))
    intercept[IllegalArgumentException](
      Drift.psiCategorical(
        (1 to 40).map(_.toString).toDF("cat"),
        Seq("1").toDF("cat"), "cat", maxCategories = 10).collect())
  }
}
