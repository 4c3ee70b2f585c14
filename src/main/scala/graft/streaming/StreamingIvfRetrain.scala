package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.similarity.{Retrain, Similarity}

/** ONLINE drift-triggered epoch swap — q222's retrain consumer wired
  * INTO the mixed streaming maintenance loop (the r17 verdict's
  * next-round #3: the batch consumer existed, but a production serving
  * loop retrains WHILE maintaining). One stream of vector adds and
  * takedown removes folds into the standing posting table under the
  * CURRENT frozen quantizer ([[StreamingIvfMixed]]'s machinery,
  * unchanged); a k-row integer drift monitor watches what each fold
  * actually ADDS; when the q203 predicate fires, the swap runs at the
  * fold boundary:
  *
  *   - the successor quantizer trains FROM SCRATCH over the retained
  *     corpus ([[Similarity.trainCells]] — the same trajectory a cold
  *     build walks, so the swapped index is indistinguishable from one
  *     trained fresh; q223 gates exactly that),
  *   - every retained vector re-encodes under it
  *     ([[StreamingIvfMixed.IvfState.reencode]] — which also folds the
  *     removal layers compaction-style, so NO-RESURRECTION crosses the
  *     epoch boundary: a takedown from epoch N still blocks a re-add
  *     in epoch N+1, spec-pinned),
  *   - the epoch counter advances and SUBSEQUENT folds assign under
  *     the new quantizer. Until the swap completes, every read —
  *     including the fold that triggered it — serves the OLD epoch;
  *     the foreachBatch callback is the commit point, so no query ever
  *     sees half-trained state (RetrainSpec's single-reference rule,
  *     streamed).
  *
  * Monitor bookkeeping is ≤ k integer rows per fold
  * ([[Retrain.monitorStats]] of the fold's RETAINED adds — a
  * fully-dropped add batch must not fire): on no-fire the delta frame
  * FOLDS INTO the baseline (those vectors are history for every later
  * fold), on fire the baseline resets to the new epoch's corpus — so
  * the same drift does not re-fire every subsequent fold against a
  * stale baseline. Removals don't decrement the baseline (the monitor
  * is a drift instrument, not an exact census; the fire predicate
  * itself stays integer-exact on whatever frames it is handed).
  *
  * StreamingIvfRetrainSpec pins the fire-at-fold-boundary path, the
  * no-fire stream reusing epoch 0 verbatim, and no-resurrection across
  * the swap; q223 gates the streamed fire path against DuckDB's
  * from-scratch full-corpus training replay. */
object StreamingIvfRetrain {

  /** The serving artifacts after the stream drains: the retained
    * posting table, the quantizer it is encoded under, and how many
    * swaps the monitor fired (epoch 0 = never). */
  final case class Served(postings: DataFrame,
      cents: Array[(Int, Array[Double])], epoch: Long)

  /** Run `opStream` (op 'add'|'rm' + idCol + `e` ARRAY<DOUBLE>) to
    * completion under AvailableNow against `initialPostings`
    * (idCol, cell, e) encoded under `cents0`, with drift-triggered
    * retraining. `monitor` is the frozen integer drift instrument
    * (its baseline starts from the standing corpus); `k`/`iters` are
    * the successor quantizer's training knobs. */
  def maintain(opStream: DataFrame, initialPostings: DataFrame,
      cents0: Array[(Int, Array[Double])],
      monitor: Seq[(Long, Array[Long])], k: Int, iters: Int,
      checkpoint: String, idCol: String = "vec_id",
      compactBound: Int = 10000): Served = {
    val spark = opStream.sparkSession
    val state = new StreamingIvfMixed.IvfState(spark, initialPostings,
      idCol, compactBound, persistDir = None, recovered = None)
    var cents = cents0
    var epoch = 0L
    // the baseline = the standing corpus's monitor frame (posting rows
    // carry the vector in `e`, so the standing table IS the population)
    var baseline = Retrain.monitorStats(initialPostings, monitor,
      idCol, "e")
    // closes over `cents`: after a swap, later folds assign under the
    // successor quantizer with no re-wiring
    def mk(df: DataFrame): DataFrame =
      Similarity.assignCells(df, cents, idCol, "e")
        .select(col(idCol), col("cell"), col("e"))
    EpochSnapshots.runAvailableNow(opStream, checkpoint) { (batch, id) =>
      val added = state.fold(batch, id, mk)
      added.foreach { a =>
        val delta = Retrain.monitorStats(a, monitor, idCol, "e")
        if (Retrain.fires(baseline, delta)) {
          // fold-boundary swap: train from scratch on the retained
          // corpus, re-encode, advance, reset the baseline to the new
          // epoch's corpus
          cents = Similarity.trainCells(
            state.read.select(col(idCol), col("e")), k, iters, idCol,
            "e")
          state.reencode(mk, id)
          epoch += 1
          baseline = Retrain.monitorStats(state.read, monitor, idCol,
            "e")
        } else baseline = Retrain.mergeStats(baseline, delta)
      }
    }
    Served(state.read, cents, epoch)
  }
}
