package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** MMR: relevance ties break to min id, an exact duplicate of a selected
  * item is deferred in favor of an equally-relevant DIVERSE item (the
  * whole point of the operator), and selection stops early when the
  * candidate pool runs dry. */
class MmrSpec extends AnyFunSuite with SparkTestBase {

  test("diverse equally-relevant item beats the near-copy; ties to min id") {
    import spark.implicits._
    // a and c are both at ~18 deg from the implied query (rel 0.95), but
    // ~37 deg from each other (cos ~0.805); b is an exact COPY of a.
    // Greedy: a (min id on the rel tie), then c (0.7*.95 - 0.3*.805 =
    // .4234 beats b's 0.7*.95 - 0.3*1 = .365), then b.
    val vecs = Seq(
      (1L, Seq(0.95f, 0.312f, 0f), 0.95),
      (2L, Seq(0.95f, 0.312f, 0f), 0.95),
      (3L, Seq(0.95f, -0.312f, 0f), 0.95))
      .toDF("vec_id", "embedding", "rel")
    val out = Mmr.select(vecs, "rel", k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq === Seq(1L, 3L, 2L))
    assert(out.head._3 === 0.95) // rank-1 mmr is the bare relevance
    assert(out(1)._3 > out(2)._3, "diverse pick scored above the copy")
  }

  test("zero-norm vector fails loudly instead of poisoning the greedy " +
      "trajectory with null cosines") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1f, 0f), 0.9), (2L, Seq(0f, 0f), 0.8))
      .toDF("vec_id", "embedding", "rel")
    val e = intercept[Exception](Mmr.select(vecs, "rel", k = 2).collect())
    assert(e.getMessage.contains("zero-norm") ||
      Option(e.getCause).exists(_.getMessage.contains("zero-norm")),
      s"expected the zero-norm raise, got: ${e.getMessage}")
  }

  test("selection stops when candidates run out (k > pool)") {
    import spark.implicits._
    val vecs = Seq((1L, Seq(1f, 0f), 0.9), (2L, Seq(0f, 1f), 0.8))
      .toDF("vec_id", "embedding", "rel")
    val out = Mmr.select(vecs, "rel", k = 5).collect()
    assert(out.length === 2)
  }
}
