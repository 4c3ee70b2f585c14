package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Lloyd k-means: planted clusters recovered, deterministic integer
  * tie-breaks, and the per-round scale shape (assignment is a pure map —
  * no exchange anywhere in the final assignment plan). */
class ClusteringSpec extends AnyFunSuite with SparkTestBase {

  private def frame(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("planted clusters are recovered; dist2 is integer-exact") {
    val vecs = frame(Seq(
      0L -> Seq(0f, 0f),
      1L -> Seq(10f, 10f),
      2L -> Seq(0.1f, 0f),
      3L -> Seq(9.9f, 10f)))
    val out = Clustering.lloyd(vecs, k = 2, rounds = 2, scale = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(0L)._1 === 0L && out(2L)._1 === 0L)
    assert(out(1L)._1 === 1L && out(3L)._1 === 1L)
    // after one update, centroid 0 = floor-mean of q-vectors {(0,0),
    // (100,0)} = (50, 0); vec 2 quantizes to (100, 0) -> dist2 = 50²
    assert(out(2L)._2 === 2500L)
  }

  test("equidistant vectors break toward the smaller cluster id") {
    val vecs = frame(Seq(
      0L -> Seq(0f, 0f),
      1L -> Seq(10f, 10f),
      2L -> Seq(5f, 5f))) // exactly between the two seeds
    val out = Clustering.lloyd(vecs, k = 2, rounds = 1, scale = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) === 0L, "tie must go to the smaller cluster id")
  }

  test("quantization floors (never rounds): -0.0005 and 0.0004 land in " +
      "different integer cells") {
    import spark.implicits._
    val q = Seq((0L, Seq(-0.0005f, 0.0004f))).toDF("vec_id", "embedding")
      .select(Clustering.quantized(col("embedding"), 1000).as("q"))
      .collect().head.getSeq[Long](0)
    assert(q === Seq(-1L, 0L))
  }

  test("assignment plan is a pure map: no exchange, no join") {
    val vecs = frame((0L until 64L).map(i =>
      i -> Seq.fill(4)((i % 7).toFloat)))
    val plan = Clustering.lloyd(vecs, k = 3, rounds = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Join"),
      s"assignment must not join the corpus:\n$plan")
  }

  test("clusterPrune: keep-min-id within the dup relation; exact " +
      "threshold boundary drops (>= semantics); cross-cluster pairs " +
      "never compared") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(3f, 4f)),   // cluster 0
      (1L, Seq(6f, 8f)),   // parallel to 0 -> cos 1 -> dropped (larger id)
      (2L, Seq(4f, -3f)),  // orthogonal to 0 -> kept
      (3L, Seq(1f, 0f)),   // cluster 1
      (4L, Seq(4f, 3f)),   // cos(3,4) = 4/5 = tau exactly -> dropped
      (5L, Seq(3f, 4f)))   // cluster 2: IDENTICAL to vec 0, but alone in
                           // its cluster -> must be kept
      .toDF("vec_id", "embedding")
    val assign = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 2L)).toDF("vec_id", "cluster")
    val out = Clustering.clusterPrune(vecs, assign, scale = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> true, 3L -> true,
      4L -> false, 5L -> true))
  }

  test("assignTopM: rank order by encoded distance, ties to smaller " +
      "cluster id; rank-1 equals lloyd's assignment") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)), (2L, Seq(5f, 5f)))
      .toDF("vec_id", "embedding")
    val cents = Clustering.lloydCentroids(vecs, k = 2, updates = 0)
    val a2 = Clustering.assignTopM(vecs, cents, m = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a2((0L, 1)) === 0L && a2((0L, 2)) === 1L)
    assert(a2((1L, 1)) === 1L && a2((1L, 2)) === 0L)
    // vec 2 equidistant: rank 1 -> smaller cluster id
    assert(a2((2L, 1)) === 0L && a2((2L, 2)) === 1L)
    val lloyd1 = Clustering.lloyd(vecs, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 2L).forall(i => lloyd1(i) === a2((i, 1))))
  }

  test("assign against lloydCentroids(updates = r-1) is bit-identical " +
      "to lloyd(rounds = r) — the frozen-index maintenance contract") {
    import spark.implicits._
    // 2 planted clusters + a straggler so the round-2 update moves a
    // centroid (assign must see the TRAINED centroids, not the seeds)
    val vecs = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)), (2L, Seq(0.4f, 0f)),
      (3L, Seq(9.5f, 10.2f)), (4L, Seq(6f, 6f)))
      .toDF("vec_id", "embedding")
    for (r <- Seq(1, 2, 3)) {
      val viaLloyd = Clustering.lloyd(vecs, k = 2, rounds = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(_._1).toSeq
      val viaAssign = Clustering
        .assign(vecs, Clustering.lloydCentroids(vecs, k = 2, updates = r - 1))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sortBy(_._1).toSeq
      assert(viaLloyd === viaAssign, s"rounds = $r")
    }
  }

  test("assign/assignTopM reject centroid labels outside the (dist, cid) " +
      "encoding range instead of silently corrupting the argmin") {
    import spark.implicits._
    val vecs = Seq((0L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    for (badCid <- Seq(1L << 20, -1L)) {
      val cents = Seq(badCid -> Array(0L, 0L), 1L -> Array(10L, 10L))
      val e = intercept[IllegalArgumentException](Clustering.assign(vecs, cents))
      assert(e.getMessage.contains("cluster label"))
      val e2 = intercept[IllegalArgumentException](
        Clustering.assignTopM(vecs, cents, m = 1))
      assert(e2.getMessage.contains("cluster label"))
    }
  }

  test("assign lands a DELTA batch in history-trained cells without " +
      "touching the training set; drift shows in dist2") {
    import spark.implicits._
    val hist = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)),
      (2L, Seq(0.2f, 0f)), (3L, Seq(9.8f, 10f)))
      .toDF("vec_id", "embedding")
    val cents = Clustering.lloydCentroids(hist, k = 2, updates = 1)
    // in-distribution delta row + a drifted one, both nearest cell 0
    val delta = Seq((10L, Seq(0.1f, 0.1f)), (11L, Seq(3f, 3f)))
      .toDF("vec_id", "embedding")
    val a = Clustering.assign(delta, cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(a(10L)._1 === 0L && a(11L)._1 === 0L)
    // trained centroid 0 = floor-mean of {(0,0),(200,0)} = (100, 0)
    assert(a(10L)._2 === 0L + (100 - 100) * (100 - 100) + 100 * 100)
    assert(a(11L)._2 === (3000 - 100) * (3000 - 100) + 3000L * 3000L)
    assert(a(11L)._2 > 25 * a(10L)._2) // the retrain-trigger magnitude gap
  }

  test("dist2 past 2^33 stays bit-exact (shiftright extraction — the " +
      "double-division form lost low bits here)") {
    // 1-dim, diff 150000 after scale: dist2 = 150000^2 = 22_500_000_000
    // > 2^33; encoded comb ~ 2.36e16 > 2^53 would round under double /
    val vecs = frame(Seq(0L -> Seq(0f), 1L -> Seq(150f)))
    val out = Clustering.lloyd(vecs, k = 1, rounds = 1, scale = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 22500000000L)
  }

  test("a dist2 the (dist,cid) encoding cannot carry raises instead of " +
      "silently wrapping the argmin") {
    // diff 3_000_000 after scale: dist2 = 9e12 > (2^63-2^20)/2^20
    val vecs = frame(Seq(0L -> Seq(0f), 1L -> Seq(3000f)))
    val e = intercept[Exception](
      Clustering.lloyd(vecs, k = 1, rounds = 1, scale = 1000).collect())
    assert(e.getMessage.contains("overflows") ||
      Option(e.getCause).exists(_.getMessage.contains("overflows")),
      s"expected the encoding-overflow raise, got: ${e.getMessage}")
  }

  test("clusterPrune raises when the integer cosine products would pass " +
      "the Long ceiling instead of flipping the decision") {
    import spark.implicits._
    // dot = (30*1000)^2 = 9e8 > LongRoot/tauDen with tauDen=5 (6.07e8)
    val vecs = frame(Seq(0L -> Seq(30f), 1L -> Seq(30f)))
    val assign = Seq((0L, 0L), (1L, 0L)).toDF("vec_id", "cluster")
    val e = intercept[Exception](
      Clustering.clusterPrune(vecs, assign, tauNum = 4, tauDen = 5,
        scale = 1000).collect())
    assert(e.getMessage.contains("overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow")),
      s"expected the cosine-overflow raise, got: ${e.getMessage}")
  }

  test("three rounds on a drifting corpus stay deterministic across " +
      "repeated runs (integer arithmetic has no summation-order noise)") {
    val vecs = frame((0L until 40L).map(i =>
      i -> Seq.tabulate(8)(d => ((i * 13 + d * 5) % 29).toFloat / 3f)))
    def run() = Clustering.lloyd(vecs, k = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run() === run())
  }
}
