package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drift-triggered retraining for the trained-IVF family — the
  * CONSUMER of the q203/q205 monitor (the r16 verdict's next-round #3:
  * "q203 computes the integer-exact drift trigger but nothing consumes
  * it"). The production pattern at 100 TB: serving runs on a frozen
  * EPOCH (centroids + posting table — the deployed artifacts every
  * query in the trained-IVF family assumes); a cheap keyed-aggregate
  * monitor watches each ingest slice; when the trigger fires the
  * expensive retrain → re-encode runs OFFLINE against the full corpus,
  * and only the finished artifact set swaps in. Serving reads the OLD
  * epoch until the swap commits — [[maybeSwap]] returns either the old
  * epoch VERBATIM (same object, artifacts untouched) or a fully-built
  * successor; the caller's single reference assignment IS the commit
  * point, so there is no window where queries see half-trained state.
  *
  * RetrainSpec pins both paths (no-fire returns the old epoch
  * unmutated; fire trains exactly [[Similarity.trainCells]]'
  * trajectory on the full corpus); q222 gates the fire path end-to-end
  * against DuckDB's from-scratch full-corpus training replay. */
object Retrain {

  /** One deployed artifact generation: the coarse quantizer and the
    * posting table every serve-path query keys by `cell`. */
  final case class IvfEpoch(epoch: Long,
      cents: Array[(Int, Array[Double])], postings: DataFrame)

  /** A population's ≤ k-row monitor aggregate under the frozen integer
    * monitor: cluster → (count, Σ quantized dist²). The sums widen to
    * decimal INSIDE the aggregate (a BIGINT sum can silently wrap on a
    * large population — r17 advisor; q203 widens identically) and land
    * driver-side as exact BigInt, so monitor frames compose (a
    * streaming baseline folds each fold's delta in by plain addition)
    * and compare with no FP anywhere. One keyed integer aggregate, one
    * bounded ≤ k-row collect. */
  def monitorStats(pop: DataFrame, monitor: Seq[(Long, Array[Long])],
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Map[Long, (Long, BigInt)] =
    Clustering.assign(pop, monitor, idCol, vecCol)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist2").cast("decimal(38,0)")).as("dist2"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
      .toMap

  /** Pointwise sum of two monitor frames — the streaming baseline
    * update (after a no-fire fold, the delta's vectors ARE history for
    * every later fold). */
  def mergeStats(a: Map[Long, (Long, BigInt)],
      b: Map[Long, (Long, BigInt)]): Map[Long, (Long, BigInt)] =
    (a.keySet ++ b.keySet).map { c =>
      val (na, da) = a.getOrElse(c, (0L, BigInt(0)))
      val (nb, db) = b.getOrElse(c, (0L, BigInt(0)))
      c -> (na + nb, da + db)
    }.toMap

  /** The fire decision on two monitor frames: true iff ANY cell trips
    * `dist2_delta · n_hist > 2 · dist2_hist · n_delta` (mean quantized
    * assignment error of the delta more than doubles the history's,
    * cell-locally). Exact integer cross-multiplication — reproducible
    * across engines and run orders. A cell absent from a frame
    * contributes zeros (the full-outer convention: a cell no delta
    * reaches stays false, and so does the degenerate all-delta cell). */
  def fires(hist: Map[Long, (Long, BigInt)],
      delta: Map[Long, (Long, BigInt)]): Boolean =
    (hist.keySet ++ delta.keySet).exists { c =>
      val (nH, dH) = hist.getOrElse(c, (0L, BigInt(0)))
      val (nD, dD) = delta.getOrElse(c, (0L, BigInt(0)))
      dD * nH > 2 * dH * nD
    }

  /** q203's integer-exact drift predicate reduced to the FIRE
    * decision — [[monitorStats]] of each population compared by
    * [[fires]]. Two keyed aggregates, two ≤ k-row collects. */
  def triggerFires(hist: DataFrame, delta: DataFrame,
      monitor: Seq[(Long, Array[Long])], idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean =
    fires(monitorStats(hist, monitor, idCol, vecCol),
      monitorStats(delta, monitor, idCol, vecCol))

  /** Trigger-gated retrain → re-encode → epoch swap. When the monitor
    * does NOT fire, returns `old` verbatim — the old artifacts keep
    * serving, nothing is trained, nothing is touched. When it fires,
    * builds the complete successor epoch — quantizer retrained from
    * scratch over the FULL `corpus` ([[Similarity.trainCells]], the
    * same trajectory a cold build walks, so the swapped-in index is
    * indistinguishable from one trained fresh — q222's oracle pins
    * exactly that), every vector re-encoded under the new centroids —
    * and returns it with the epoch counter advanced. The caller swaps
    * its serving reference to the returned value; until that
    * assignment, every reader still resolves the old epoch. */
  def maybeSwap(old: IvfEpoch, corpus: DataFrame, hist: DataFrame,
      delta: DataFrame, monitor: Seq[(Long, Array[Long])], k: Int,
      iters: Int, idCol: String = "vec_id",
      monitorVecCol: String = "embedding", vecCol: String = "e")
      : IvfEpoch = {
    if (!triggerFires(hist, delta, monitor, idCol, monitorVecCol)) old
    else {
      val cents = Similarity.trainCells(corpus, k, iters, idCol, vecCol)
      val postings = Similarity.assignCells(corpus, cents, idCol, vecCol)
        .select(col(idCol), col("cell"), col(vecCol))
      IvfEpoch(old.epoch + 1, cents, postings)
    }
  }
}
