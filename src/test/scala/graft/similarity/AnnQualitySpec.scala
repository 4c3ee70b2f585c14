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

  private lazy val cents = {
    val c = Similarity.trainCells(emb, k = 8, iters = 2)
    assert(c.length > 1 && c.length <= 8)
    c
  }

  private lazy val trainedRecall = {
    val assigned = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    recallAt(topkMap(Similarity.ivfTopK(assigned, K, labelCol = "cell")))
  }

  private def multiProbeRecall(p: Int): Double =
    recallAt(topkMap(Similarity.ivfMultiProbeTopK(emb, cents, K, probes = p)))

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

  test("multi-probe IVF: recall rises with probes; p=3 reaches 0.6") {
    val r = (1 to 4).map(p => p -> multiProbeRecall(p)).toMap
    r.toSeq.sortBy(_._1).foreach { case (p, v) =>
      info(f"IVF(trained, probes=$p) recall@$K = $v%.4f (cost ~ $p/8 of pairs)")
    }
    // p=1 must equal the single-probe trained path exactly (same cells,
    // same ranking contract) — the knob degenerates cleanly.
    assert(math.abs(r(1) - trainedRecall) < 1e-12,
      s"p=1 ${r(1)} != single-probe $trainedRecall")
    assert(r(1) < r(2) && r(2) < r(3) && r(3) <= r(4),
      s"recall must rise with probes: $r")
    // The tunable-recall contract: 3 of 8 cells recovers >= 0.6 of the
    // exact top-3 on this corpus (vs 0.352 single-probe).
    assert(r(3) >= 0.6, f"recall@$K at p=3 = ${r(3)}%.4f < 0.6")
  }

  private lazy val bigEmb: DataFrame =
    Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .cache()

  private lazy val exactBig: Map[Long, Set[Long]] = topkMap(
    Similarity.ivfTopK(bigEmb.withColumn("c0", lit(0)), K, labelCol = "c0"))

  private def recallBig(approx: Map[Long, Set[Long]]): Double =
    exactBig.iterator.map { case (id, ex) =>
      (ex intersect approx.getOrElse(id, Set.empty)).size
    }.sum.toDouble / (exactBig.size * K)

  test("sample-trained quantizer: 10% sample within 0.05 of full recall") {
    // The 100 TB training story: centroids are distributional estimates,
    // so a deterministic 10% id-sample must land essentially the same
    // quantizer quality as training on everything. Measured on the LARGEST
    // corpus (sf0.1, 2000 vectors → ~200-vector sample); at 500 vectors a
    // 10% sample is 50 points for 8 cells and the estimate is legitimately
    // noisy — sample size, not sample fraction, is what k-means needs.
    def recallFor(fraction: Double): Double = {
      val c = Similarity.trainCells(bigEmb, k = 8, iters = 2,
        sampleFraction = fraction)
      assert(c.length > 1 && c.length <= 8)
      val assigned = Similarity.assignCells(bigEmb, c)
        .select(col("vec_id"), col("cell"), col("e"))
      recallBig(topkMap(Similarity.ivfTopK(assigned, K, labelCol = "cell")))
    }
    val full = recallFor(1.0)
    val sampled = recallFor(0.1)
    info(f"sf0.1 IVF(trained full)          recall@$K = $full%.4f")
    info(f"sf0.1 IVF(trained on 10%% sample) recall@$K = $sampled%.4f")
    assert(sampled >= full - 0.05,
      f"sample-trained recall $sampled%.4f fell >0.05 below full $full%.4f")
  }

  test("candidate multi-assignment: recall@3 >= 0.85 at p=4 (sf0.1)") {
    // The candidate-side coverage knob: indexing every candidate under
    // its 2 nearest cells lifts p=4 recall from ~0.76 to ~0.94 on sf0.1
    // (a 2x index, the standard recall/space trade). Floors sit under the
    // measured 0.7583 / 0.9363.
    val cents = Similarity.trainCells(bigEmb, k = 8, iters = 2)
    val single = recallBig(topkMap(
      Similarity.ivfMultiProbeTopK(bigEmb, cents, K, probes = 4)))
    val multi = recallBig(topkMap(
      Similarity.ivfMultiProbeTopK(bigEmb, cents, K, probes = 4,
        assignProbes = 2)))
    info(f"sf0.1 IVF(p=4, a=1) recall@$K = $single%.4f")
    info(f"sf0.1 IVF(p=4, a=2) recall@$K = $multi%.4f")
    assert(single >= 0.70, f"a=1 recall regressed: $single%.4f")
    assert(multi >= 0.85, f"a=2 recall@$K = $multi%.4f < 0.85")
    assert(multi > single + 0.05, "multi-assignment must add real recall")
  }

  test("IVF-flat refine: int8 shortlist at s=4k re-ranks to the exact " +
    "probed answer") {
    // Stage-1 scores candidates against the int8 scalar-quantized index
    // (asymmetric: exact query x quantized candidate), stage-2 re-ranks a
    // per-query shortlist with the exact cosine. At s=4k the refined
    // top-k must AGREE per query with the full exact-rank multi-probe
    // path — quantization may only reorder below the shortlist horizon.
    // (The compressed index pays off in shuffle/state bytes at scale —
    // 1 byte/dim vs 8 through the cell join — not in compute at 500
    // vectors.)
    val refined = topkMap(Similarity.ivfRefineTopK(emb, cents, K,
      probes = 3, shortlist = 4 * K))
    val exact3 = topkMap(Similarity.ivfMultiProbeTopK(emb, cents, K,
      probes = 3))
    val agree = exact3.keys.count(id =>
      exact3(id) == refined.getOrElse(id, Set.empty))
    info(s"refine agreement at s=4k: $agree/${exact3.size} queries")
    assert(agree == exact3.size,
      s"refine lost neighbors on ${exact3.size - agree} queries")
    // and through the a=2 index the refine path clears the same 0.85 bar
    val centsBig = Similarity.trainCells(bigEmb, k = 8, iters = 2)
    val refBig = recallBig(topkMap(Similarity.ivfRefineTopK(
      bigEmb, centsBig, K, probes = 4, shortlist = 4 * K, assignProbes = 2)))
    info(f"sf0.1 refine(p=4, a=2, s=4k) recall@$K = $refBig%.4f")
    assert(refBig >= 0.85, f"refine recall $refBig%.4f < 0.85")
  }

  test("IVF-PQ ADC (q104 config) recall@3 vs exact truth, both scales") {
    // The PLANS.md ANN table's fourth operating point: the m-byte PQ
    // index with ADC shortlist + exact refine, at q104's coarse/PQ
    // config (coarse k=8/i=2 single-probe, PQ m=8 ksub=16 i=2).
    // Recall is bounded by single-probe CELL coverage (the q66 ceiling);
    // under that ceiling the SHORTLIST is the knob: the 8-byte-per-
    // vector quantized ranking misorders near the cut, so s must scale
    // with cell size. Measured sf0.1 (cells ~250 vectors): s=20 loses
    // ~0.10 of the 0.2912 ceiling, s=64 is at 0.2672, s=128 recovers to
    // within 0.006 — the curve a user sizing s against cell occupancy
    // needs.
    def pqRecall(embDf: DataFrame, rec: Map[Long, Set[Long]] => Double,
        shortlists: Seq[Int]): (Seq[Double], Double) = {
      val cc = Similarity.trainCells(embDf, k = 8, iters = 2)
      val pq = Similarity.trainPq(embDf, m = 8, ksub = 16, iters = 2)
      val adcs = shortlists.map(s => rec(topkMap(
        Similarity.pqAdcRefineTopK(embDf, cc, pq, m = 8, k = K,
          shortlist = s))))
      val assigned = Similarity.assignCells(embDf, cc)
        .select(col("vec_id"), col("cell"), col("e"))
      val exactCell = rec(topkMap(
        Similarity.ivfTopK(assigned, K, labelCol = "cell")))
      (adcs, exactCell)
    }
    val (Seq(adcSmall), cellSmall) = pqRecall(emb, recallAt, Seq(20))
    info(f"sf0.001 IVF-PQ ADC s=20 (q104) recall@$K = $adcSmall%.4f")
    info(f"sf0.001 exact single-probe     recall@$K = $cellSmall%.4f")
    val (Seq(adc20, adc64, adc128), cellBig) =
      pqRecall(bigEmb, recallBig, Seq(20, 64, 128))
    info(f"sf0.1   IVF-PQ ADC s=20 (q104) recall@$K = $adc20%.4f")
    info(f"sf0.1   IVF-PQ ADC s=64        recall@$K = $adc64%.4f")
    info(f"sf0.1   IVF-PQ ADC s=128       recall@$K = $adc128%.4f")
    info(f"sf0.1   exact single-probe     recall@$K = $cellBig%.4f")
    // sf0.001: cells ~62 vectors, s=20 covers a third of the cell — the
    // shortlist may only lose a sliver under the ceiling
    assert(adcSmall >= cellSmall - 0.05,
      f"sf0.001 ADC $adcSmall%.4f vs cell $cellSmall%.4f")
    // sf0.1: shortlist scaling must recover the ceiling; s=20's loss is
    // real and pinned (floor catches regression, documents the trade)
    assert(adc128 >= cellBig - 0.02,
      f"s=128 must recover the cell ceiling: $adc128%.4f vs $cellBig%.4f")
    assert(adc20 >= 0.17 && adc20 < adc64 && adc64 <= adc128,
      f"shortlist curve must rise: $adc20%.4f, $adc64%.4f, $adc128%.4f")

    // probes compose with PQ: the recall knobs (p, a) lift the cell
    // ceiling itself, independent of the memory axis — measured
    // 0.70@s=128 / 0.83@256 / 0.88@384 at p=4/a=2 vs 0.9363 for
    // exact-scoring IVF at the same knobs. The residual gap is the
    // 8-byte quantized ranking over a probed pool that is ~the whole
    // corpus — this synthetic data is PQ's documented worst case
    // (PLANS.md); the candidate payload through the bigger join stays
    // m bytes, which is the axis PQ actually buys
    val ccB = Similarity.trainCells(bigEmb, k = 8, iters = 2)
    val pqB = Similarity.trainPq(bigEmb, m = 8, ksub = 16, iters = 2)
    val probedCurve = Seq(128, 256, 384).map { s =>
      val r = recallBig(topkMap(Similarity.pqAdcRefineTopK(
        bigEmb, ccB, pqB, m = 8, k = K, shortlist = s,
        probes = 4, assignProbes = 2)))
      info(f"sf0.1   IVF-PQ ADC p=4,a=2,s=$s%-3d recall@$K = $r%.4f")
      s -> r
    }.toMap
    assert(probedCurve(128) >= 0.60 &&
      probedCurve(128) < probedCurve(384),
      f"probed PQ curve: ${probedCurve}")
  }

  test("1-byte PQ codes (ksub=256, q118 config) recover the cell ceiling " +
      "that ksub=16 leaves on the table") {
    // The round-9 finding (PLANS.md): at the SAME 8-byte-per-vector index
    // budget, spending the full byte per code closes the quantized-
    // shortlist ranking gap entirely. Measured here at sf0.001/s=20:
    // ksub=16 0.3140 < ksub=256 0.3520 = the exact-scoring single-probe
    // ceiling; at sf0.1/p=4/a=2/s=384 the same move lands 0.9363 = that
    // config's ceiling (OpqTuning). Pin the ordering and the
    // ceiling-recovery so a codebook/ADC regression shows up here.
    def adcRecall(ksub: Int): Double = {
      val pq = Similarity.trainPq(emb, m = 8, ksub = ksub, iters = 2)
      recallAt(topkMap(Similarity.pqAdcRefineTopK(
        emb, cents, pq, m = 8, k = K, shortlist = 20)))
    }
    val r16 = adcRecall(16)
    val r256 = adcRecall(256)
    val assigned = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val ceiling = recallAt(topkMap(
      Similarity.ivfTopK(assigned, K, labelCol = "cell")))
    info(f"ADC s=20 ksub=16  recall@$K = $r16%.4f")
    info(f"ADC s=20 ksub=256 recall@$K = $r256%.4f")
    info(f"exact single-probe ceiling  = $ceiling%.4f")
    assert(r256 > r16,
      f"1-byte codes must beat 4-bit codes: $r256%.4f vs $r16%.4f")
    assert(r256 >= ceiling - 0.005,
      f"ksub=256 must recover the cell ceiling: $r256%.4f vs $ceiling%.4f")
  }

  test("hyperplane LSH: recall falls as planes rise; lift over random holds") {
    val rs = Seq(4, 8, 16).map { planes =>
      val bucketed = emb.select(col("vec_id"), col("e"),
        Similarity.hyperplaneBucket(spark, col("e"), dim = 64, planes = planes)
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
