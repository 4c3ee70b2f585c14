package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-substring duplicate detection — the incremental
  * counterpart of the batch span detector (q74, `Dedup.dupSpans`, Lee et
  * al. 2021 style): a char-k-gram occurrence is *duplicated* once its hash
  * has been seen at least `minCount` times corpus-wide, counting every
  * document streamed so far.
  *
  * The batch path aggregates gram frequencies, joins the ≥ minCount hashes
  * back to positions, and merges spans. A stream cannot re-join its own
  * history, so the standing-state formulation keys the gram-hash stream by
  * `hv` and keeps, per hash, the running count plus the ≤ minCount−1
  * occurrences seen before the gate opened: when occurrence number
  * `minCount` arrives, the buffered positions flush together with it, and
  * every later occurrence emits immediately. Each position is emitted
  * EXACTLY once, so the union of all micro-batch outputs equals the batch
  * detector's duplicated-position set on the same corpus — regardless of
  * how documents are split across batches (StreamingDupSpansSpec pins the
  * equality; span merging / dup_frac rollups are a per-consumer
  * `foreachBatch` concern, exactly as the batch operator leaves them to
  * `dupSpans`' window).
  *
  * State: one entry per DISTINCT gram hash — the same vocabulary-sized
  * footprint as the batch frequency aggregation's state, with ≤ minCount−1
  * buffered (docId, pos) pairs each (for the default minCount = 2: one).
  * Like the batch detector, the memory is the price of exactness;
  * `idleTtl` is the lever for lifetime deployments (the same
  * processing-time timeout the near-dup bucket state uses): grams idle
  * past the TTL are dropped, so a gram recurring after an idle gap longer
  * than the TTL restarts its count from zero and duplicates straddling
  * the gap are MISSED — output becomes a documented SUBSET of the batch
  * detector's (never a superset: exactly-once emission is unaffected).
  * Default keeps the unbounded exact behavior the batch-equality spec
  * pins.
  */
object StreamingDupSpans {

  final case class GramPos(hv: Long, docId: Long, pos: Int)
  final case class DupPos(docId: Long, pos: Int, hv: Long)

  /** Running count per gram hash + the occurrences buffered while the
    * count was still below the gate (parallel arrays — one compact state
    * row per hash). */
  final case class GramState(count: Long, pendDoc: Array[Long],
      pendPos: Array[Int])

  /** (hv, docId, pos) rows from a streaming (doc_id, text) frame — the
    * SAME document-local rolling-hash pass as the batch path
    * ([[graft.dedup.Dedup.gramPositions]], native
    * [[graft.functions.GramHashes]]), so stream and batch agree
    * bit-for-bit; a pure map stage, streamable with no shuffle before the
    * hash exchange. */
  def gramPositions(docs: DataFrame, k: Int = 40): Dataset[GramPos] = {
    import docs.sparkSession.implicits._
    graft.dedup.Dedup.gramPositions(docs, k = k)
      .select(col("hv"), col("doc_id").as("docId"), col("pos"))
      .as[GramPos]
  }

  /** Positions that became duplicated, streamed — `(docId, pos, hv)`, each
    * exactly once, in the micro-batch where its gram's corpus count
    * reached `minCount` (or any later batch it occurs in once the gate is
    * open). */
  def duplicatedPositions(grams: Dataset[GramPos], minCount: Int = 2,
      idleTtl: Option[java.time.Duration] = None): Dataset[DupPos] = {
    import grams.sparkSession.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    grams.groupByKey(_.hv)
      .flatMapGroupsWithState[GramState, DupPos](
        OutputMode.Append, timeoutConf) {
        (hv, rows, state: GroupState[GramState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: forget the gram (count restarts at its
            // next occurrence — the documented straddle loss)
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(
              GramState(0L, Array.empty, Array.empty))
            var count = prev.count
            val pendDoc = scala.collection.mutable.ArrayBuffer(
              prev.pendDoc.toSeq: _*)
            val pendPos = scala.collection.mutable.ArrayBuffer(
              prev.pendPos.toSeq: _*)
            val out = scala.collection.mutable.ArrayBuffer.empty[DupPos]
            rows.foreach { r =>
              count += 1
              if (count < minCount) {
                pendDoc += r.docId
                pendPos += r.pos
              } else {
                if (pendDoc.nonEmpty) { // the gate just opened: flush
                  pendDoc.indices.foreach(i =>
                    out += DupPos(pendDoc(i), pendPos(i), hv))
                  pendDoc.clear()
                  pendPos.clear()
                }
                out += DupPos(r.docId, r.pos, hv)
              }
            }
            state.update(GramState(count, pendDoc.toArray, pendPos.toArray))
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.iterator
          }
      }
  }
}
