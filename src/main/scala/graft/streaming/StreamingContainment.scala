package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.Dedup

/** Streaming containment DECONTAMINATION — [[Dedup.containmentAcross]]
  * served as the natural production shape (the r14 verdict's missing
  * streaming twin, the q145 pattern applied to containment): a stream of
  * suspect/benchmark passages is probed per micro-batch against the
  * STATIC corpus prefix index ([[Dedup.containmentIndex]], prepared and
  * materialized once), and exact containment hits append to a per-batch
  * parquet sink.
  *
  * Every probe's prefix (pigeonhole over corpus-df-ordered grams),
  * candidates, integer size filter, and exact intersect verify depend
  * only on its OWN grams and the static index — no probe↔probe
  * interaction — so the result set is the union of per-batch results
  * however the stream is split (StreamingContainmentSpec pins the
  * batch-split invariance; q211 gates the streamed result against q209's
  * batch oracle verbatim: one ground truth, batch and streamed route).
  *
  * The probe stage needs a per-probe window (prefix ranks within each
  * probe's grams), which Structured Streaming's incremental planner
  * rejects — but the computation is per-probe STATELESS, so foreachBatch
  * runs the full batch operator on each micro-batch: the standard recipe
  * for rich stateless transforms. Exactly-once lands via idempotent
  * per-batchId overwrite dirs (a replayed batch rewrites its own dir
  * with identical content); the read-back unions `out ∖ _ckpt`. */
object StreamingContainment {

  /** Run `probeStream` (any per-row schema `mkGrams` can shingle) to
    * completion under AvailableNow, probing each micro-batch against
    * `index`; returns all hits (probeIdCol, corpusIdCol, common,
    * containment). `mkGrams` turns a batch into the (probeIdCol, grams)
    * frame — shingling is per-document, so batch shingling matches the
    * batch operator's exactly. */
  def run(probeStream: DataFrame, index: Dedup.ContainmentIndex,
      num: Int, den: Int, workDir: String,
      mkGrams: DataFrame => DataFrame,
      probeIdCol: String = "probe_id"): DataFrame = {
    val spark = probeStream.sparkSession
    val q = probeStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // The batch's grams are MATERIALIZED once (bounded: one
        // micro-batch of (id, grams) rows) before probing, for two
        // measured reasons (r18 plan dump): (1) containmentProbe
        // consumes its probe frame twice (prefix rows + verify gather),
        // so an unmaterialized batch re-shingled per consumer; (2) the
        // probe's emptiness guard and the explode's inferred
        // size(grams)>0 filter push BELOW any repartition with the
        // grams alias substituted, re-evaluating the whole shingle
        // expression per row on the batch's single source split — the
        // minhashSignature trap, foreachBatch edition. Checkpointed
        // grams are attributes, so the filter costs a size() probe and
        // the shingle pass runs exactly once, post-fan-out. (Partition
        // pins on the probe stages were also tried here — 2x the task
        // time for equal wall once grams were materialized; reverted.)
        val g = graft.analytics.Graphs.flatCheckpoint(mkGrams(batch.toDF()))
        try Dedup.containmentProbe(g, index, num, den, probeIdCol)
          .write.mode("overwrite").parquet(s"$workDir/out/$batchId")
        finally graft.analytics.Graphs.freeLocalCheckpoint(g)
      }
      .option("checkpointLocation", s"$workDir/_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // an empty probe slice yields ZERO micro-batches under AvailableNow —
    // foreachBatch never runs and out/ is never created; return the empty
    // hit frame (same schema via the batch operator over an empty probe
    // frame) instead of letting the glob read throw path-not-found
    if (new java.io.File(s"$workDir/out").isDirectory)
      spark.read.parquet(s"$workDir/out/*")
    else
      Dedup.containmentProbe(
        mkGrams(spark.createDataFrame(
          java.util.Collections.emptyList[Row](), probeStream.schema)),
        index, num, den, probeIdCol)
  }
}
