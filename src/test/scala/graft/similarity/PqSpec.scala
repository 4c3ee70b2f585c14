package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Tables

/** Quality and contracts of the product-quantization path (q103/q104).
  * The driver oracle proves both engines walk identical training
  * trajectories; this suite checks what the oracle can't — that the
  * codebooks COMPRESS well (reconstruction error falls with training),
  * that the ADC shortlist actually finds the exact-in-cell answer, and
  * that encoding stays a shuffle-free map stage. */
class PqSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val M = 8
  private val Sd = 8

  private lazy val emb: DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .cache()

  private lazy val vecs: Map[Long, Array[Double]] =
    emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private lazy val pq = Similarity.trainPq(emb, m = M, ksub = 16, iters = 2)

  /** Mean squared reconstruction error of `book` over the corpus —
    * driver-side on the 500-vector spec corpus. */
  private def mse(book: Array[(Int, Int, Array[Double])]): Double = {
    val bm = book.map { case (s, c, v) => (s, c) -> v }.toMap
    val rows = Similarity.pqCodes(emb, book, M).collect()
    rows.iterator.map { r =>
      val sub = r.getInt(1)
      val cent = bm((sub, r.getInt(2)))
      val sv = vecs(r.getLong(0)).slice(sub * Sd, sub * Sd + Sd)
      sv.indices.iterator.map(i => {
        val d = sv(i) - cent(i); d * d
      }).sum
    }.sum / rows.length
  }

  test("codes are dense per subspace; training is deterministic") {
    val bySub = pq.groupBy(_._1)
    assert(bySub.keySet === (0 until M).toSet)
    bySub.foreach { case (s, cs) =>
      assert(cs.map(_._2).sorted.toSeq === (0 until cs.length),
        s"sub $s codes not dense: ${cs.map(_._2).sorted.toSeq}")
    }
    val again = Similarity.trainPq(emb, m = M, ksub = 16, iters = 2)
    assert(pq.map { case (s, c, v) => (s, c, v.toSeq) }.toSeq ===
      again.map { case (s, c, v) => (s, c, v.toSeq) }.toSeq)
  }

  test("reconstruction error falls as the codebooks train") {
    val seed = Similarity.trainPq(emb, m = M, ksub = 16, iters = 0)
    val one = Similarity.trainPq(emb, m = M, ksub = 16, iters = 1)
    val e0 = mse(seed); val e1 = mse(one); val e2 = mse(pq)
    info(f"PQ mse: seeds $e0%.5f -> iter1 $e1%.5f -> iter2 $e2%.5f")
    assert(e1 < e0, f"iter1 $e1%.5f !< seeds $e0%.5f")
    assert(e2 <= e1 + 1e-9, f"iter2 $e2%.5f > iter1 $e1%.5f")
  }

  test("encoding is a shuffle-free map stage") {
    val plan = Similarity.pqCodes(emb, pq, M)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pqCodes must not shuffle:\n$plan")
  }

  test("ADC shortlist risk curve: rises with s, exact once s covers the cell") {
    val cents = Similarity.trainCells(emb, k = 8, iters = 2)
    val assigned = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    def topkMap(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("vec_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (id, rs) =>
          id -> rs.map(_.getLong(1)).toSet
        }
    val exactInCell = topkMap(
      Similarity.ivfTopK(assigned, 3, labelCol = "cell"))
    def agree(shortlist: Int): Double = {
      val adc = topkMap(Similarity.pqAdcRefineTopK(
        emb, cents, pq, m = M, k = 3, shortlist = shortlist))
      exactInCell.iterator.map { case (id, ex) =>
        (ex intersect adc.getOrElse(id, Set.empty)).size
      }.sum.toDouble / (exactInCell.size * 3)
    }
    val curve = Seq(10, 20, 128).map(s => s -> agree(s)).toMap
    curve.toSeq.sortBy(_._1).foreach { case (s, a) =>
      info(f"ADC(shortlist=$s%3d) vs exact-in-cell agreement@3 = $a%.4f")
    }
    // compression risk is ONLY shortlist truncation (the refine re-ranks
    // exactly) — so a shortlist covering the whole cell (max 70 members
    // here) must reproduce the exact-in-cell answer IDENTICALLY ...
    assert(curve(128) == 1.0,
      f"full-cell shortlist must be exact, got ${curve(128)}%.4f")
    // ... and the risk must shrink as s grows. This synthetic corpus is
    // PQ's worst case (near-random vectors: cosine gaps are tiny next to
    // quantization error); 0.85@20 measured — q104's config.
    assert(curve(10) < curve(20) && curve(20) < curve(128),
      s"agreement must rise with shortlist: $curve")
    assert(curve(20) >= 0.8, f"ADC agreement@20 ${curve(20)}%.4f < 0.8")
  }
}
