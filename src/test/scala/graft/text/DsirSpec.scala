package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** TextStats.dsirLogRatio: target-like documents must outrank
  * corpus-typical and out-of-vocabulary ones, unseen events hit the
  * smoothing floor instead of erroring, and the score is
  * length-normalized. */
class DsirSpec extends AnyFunSuite with SparkTestBase {

  private def score(rows: (Long, Boolean, String)*): Map[Long, Double] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "tgt", "text")
    TextStats.dsirLogRatio(df, targetCol = "tgt")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logratio"))
      .toMap
  }

  test("target-domain phrasing outranks off-domain phrasing") {
    // target docs (1-3) talk about cooking; raw-only docs (4-6) about
    // engines. Doc 10 repeats cooking bigrams, doc 11 engine bigrams —
    // the cooking doc must carry the higher importance ratio.
    val m = score(
      (1L, true, "simmer the onion in butter then add salt"),
      (2L, true, "add butter and simmer the broth gently"),
      (3L, true, "season the broth with salt and butter"),
      (4L, false, "torque the piston with the crank shaft"),
      (5L, false, "align the piston to the crank housing"),
      (6L, false, "machine the shaft then torque the housing"),
      (10L, false, "simmer the broth then add butter"),
      (11L, false, "torque the crank then machine the piston"))
    assert(m(10L) > m(11L),
      s"cooking doc ${m(10L)} must outrank engine doc ${m(11L)}")
    assert(m(10L) > 0, "target-like doc should beat the corpus baseline")
    assert(m(11L) < 0, "off-target doc should fall below the baseline")
  }

  test("wholly unseen vocabulary hits the smoothing floor, no errors") {
    val m = score(
      (1L, true, "alpha beta gamma delta"),
      (2L, false, "alpha beta gamma delta"),
      (3L, false, "zzq xxv wwu yyt")) // no token ever seen in target
    assert(m.contains(3L) && !m(3L).isNaN && !m(3L).isInfinite)
    assert(m(3L) < m(2L), "OOV doc must score below an in-target twin")
  }

  test("an empty target set fails loudly instead of scoring +Inf") {
    val e = intercept[Exception] {
      score(
        (1L, false, "the cat sat on the mat"),
        (2L, false, "a dog ran in the park"))
    }
    assert(e.getMessage.contains("target set is empty") ||
      Option(e.getCause).exists(_.getMessage.contains("target set is empty")))
  }

  test("sub-2-token documents drop out; scores are length-normalized") {
    val m = score(
      (1L, true, "one"),
      (2L, true, "the cat sat"),
      (3L, false, "the cat sat"),
      (4L, false, "the cat sat the cat sat the cat sat"))
    assert(!m.contains(1L), "a 1-token doc has no bigrams")
    // doc 4 repeats doc 3's bigrams 3x; its per-bigram average must stay
    // within a small band of doc 3's (the boundary bigram 'sat the'
    // contributes twice), NOT 3x the total
    assert(math.abs(m(4L) - m(3L)) < math.abs(m(3L)) + 0.7)
  }
}
