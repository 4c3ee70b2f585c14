package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Tables
import graft.similarity.Similarity

/** Quality (not mechanics) of the approximate-similarity paths: the driver
  * oracles prove IVF/LSH compute exactly the bucketing they claim, but a
  * useless bucketing would pass that check — this suite measures recall@k
  * against the EXACT top-k answer.
  *
  * Measured on this testdata (sf0.001, 500 vectors, k=3): the PLANTED
  * `label` is nearly uncorrelated with cosine geometry — label-IVF recall
  * 0.088 is indistinguishable from the 1/10-cells random baseline — while
  * the in-engine trained quantizer (k=8, 2 Lloyd iters) reaches 0.352,
  * ~2.8× its random baseline. That is the point of training the coarse
  * quantizer instead of trusting a given partitioning, so the pinned
  * ordering `trained > 2× label` is the headline assertion. Absolute
  * floors sit just under measured values to catch regressions; the full
  * recall/cost table lives in PLANS.md. */
class AnnQualitySpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val K = 3

  private lazy val emb: DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .cache()

  /** vec_id → its exact top-K neighbor set (brute force: everything in
    * one cell). */
  private lazy val exact: Map[Long, Set[Long]] = topkMap(
    Similarity.ivfTopK(emb.withColumn("c0", lit(0)), K, labelCol = "c0"))

  private def topkMap(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("vec_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(_.getLong(1)).toSet
      }

  /** Mean recall@K: matched exact neighbors over n·K (vectors an approx
    * path leaves neighborless — singleton buckets — count as misses). */
  private def recallAt(approx: Map[Long, Set[Long]]): Double = {
    val n = exact.size
    val hit = exact.iterator.map { case (id, ex) =>
      (ex intersect approx.getOrElse(id, Set.empty)).size
    }.sum
    hit.toDouble / (n * K)
  }

  private lazy val labelRecall =
    recallAt(topkMap(Similarity.ivfTopK(emb, K, labelCol = "label")))

  private lazy val trainedRecall = {
    val cents = Similarity.trainCells(emb, k = 8, iters = 2)
    assert(cents.length > 1 && cents.length <= 8)
    val assigned = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    recallAt(topkMap(Similarity.ivfTopK(assigned, K, labelCol = "cell")))
  }

  test("trained quantizer beats the planted label by >2x recall@3") {
    info(f"IVF(label)       recall@$K = $labelRecall%.4f (random baseline 0.100)")
    info(f"IVF(trained k=8) recall@$K = $trainedRecall%.4f (random baseline 0.125)")
    assert(trainedRecall > 2 * labelRecall)
    assert(trainedRecall >= 2 * 0.125,
      "trained cells must at least double the 1/cells random baseline")
  }

  test("recall regression floors: IVF paths") {
    assert(labelRecall >= 0.07, f"label recall $labelRecall%.4f")
    assert(trainedRecall >= 0.30, f"trained recall $trainedRecall%.4f")
  }

  test("hyperplane LSH: recall falls as planes rise; lift over random holds") {
    val rs = Seq(4, 8, 16).map { planes =>
      val bucketed = emb.select(col("vec_id"), col("e"),
        Similarity.hyperplaneBucket(col("e"), dim = 64, planes = planes)
          .as("bucket"))
      val r = recallAt(topkMap(
        Similarity.ivfTopK(bucketed, K, labelCol = "bucket")))
      info(f"LSH(planes=$planes%2d) recall@$K = $r%.4f")
      planes -> r
    }.toMap
    // fewer planes → bigger buckets → more candidates → higher recall
    assert(rs(4) > rs(8) && rs(8) > rs(16))
    // measured 0.156 / 0.035 / 0.011; floors just below, and every
    // configuration must beat its occupancy-matched random baseline
    // (1/2^planes: 0.0625, ~0.004, ~0.000015) by >=2x
    assert(rs(4) >= 0.13 && rs(4) >= 2 * 0.0625, s"planes=4 ${rs(4)}")
    assert(rs(8) >= 0.028 && rs(8) >= 2 * 0.0040, s"planes=8 ${rs(8)}")
    assert(rs(16) >= 0.008, s"planes=16 ${rs(16)}")
  }
}
