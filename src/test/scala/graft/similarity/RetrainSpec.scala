package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The retrain trigger's consequence must be all-or-nothing: a quiet
  * delta returns the OLD epoch verbatim (same object — artifacts
  * untouched, nothing trained), a drifted delta returns a complete
  * successor whose quantizer walks exactly the from-scratch
  * full-corpus trajectory, with the old epoch's artifacts unharmed
  * (serving keeps reading them until the caller's swap). The trigger
  * itself is q203's integer-exact predicate — spec'd at both
  * polarities here, gated end-to-end by q222. */
class RetrainSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "e")
  }

  // history: two tight groups around (1,0) and (0,1)
  private val hist = Seq(
    1L -> Seq(1.0, 0.1), 2L -> Seq(0.9, 0.0), 3L -> Seq(1.1, 0.05),
    4L -> Seq(0.1, 1.0), 5L -> Seq(0.0, 0.9), 6L -> Seq(0.05, 1.1))

  test("quiet delta: the trigger does not fire and the OLD epoch is " +
      "returned verbatim — same object, nothing retrained") {
    val h = vecs(hist)
    // delta drawn from the same two groups — same error profile
    val d = vecs(Seq(7L -> Seq(1.0, 0.05), 8L -> Seq(0.05, 1.0)))
    val corpus = h.unionAll(d)
    val monitor = Clustering.lloydCentroids(h, vecCol = "e", k = 2,
      updates = 1)
    assert(!Retrain.triggerFires(h, d, monitor, vecCol = "e"))
    val cents = Similarity.trainCells(h, k = 2, iters = 1)
    val old = Retrain.IvfEpoch(5L, cents,
      Similarity.assignCells(corpus, cents)
        .select(col("vec_id"), col("cell"), col("e")))
    val served = Retrain.maybeSwap(old, corpus, h, d, monitor,
      k = 2, iters = 1, monitorVecCol = "e")
    assert(served eq old,
      "no-fire must reuse the old epoch verbatim, not rebuild it")
    assert(served.epoch === 5L)
  }

  test("drifted delta: the trigger fires and the successor epoch is a " +
      "from-scratch full-corpus train; the old epoch stays unharmed") {
    val h = vecs(hist)
    // delta far from both history groups (mean quantized error >> 2x)
    val d = vecs(Seq(7L -> Seq(10.0, -9.0), 8L -> Seq(-9.0, 10.0)))
    val corpus = h.unionAll(d)
    val monitor = Clustering.lloydCentroids(h, vecCol = "e", k = 2,
      updates = 1)
    assert(Retrain.triggerFires(h, d, monitor, vecCol = "e"))
    val oldCents = Similarity.trainCells(h, k = 2, iters = 1)
    val oldPostings = Similarity.assignCells(corpus, oldCents)
      .select(col("vec_id"), col("cell"), col("e"))
    val oldSnapshot = oldPostings.collect().toSet
    val old = Retrain.IvfEpoch(5L, oldCents, oldPostings)
    val served = Retrain.maybeSwap(old, corpus, h, d, monitor,
      k = 2, iters = 1, monitorVecCol = "e")
    assert(!(served eq old) && served.epoch === 6L)
    // the successor == a cold build on the full corpus
    val fresh = Similarity.trainCells(corpus, k = 2, iters = 1)
    assert(served.cents.map { case (c, v) => c -> v.toSeq }.toSeq ===
      fresh.map { case (c, v) => c -> v.toSeq }.toSeq,
      "swapped-in quantizer diverged from the from-scratch trajectory")
    assert(served.postings.collect().toSet ===
      Similarity.assignCells(corpus, fresh)
        .select(col("vec_id"), col("cell"), col("e")).collect().toSet)
    // the old epoch's artifacts survive the swap untouched
    assert(old.cents eq oldCents)
    assert(old.postings.collect().toSet === oldSnapshot,
      "the pre-swap serving artifacts must stay readable and unchanged")
  }
}
