package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger

import graft.analytics.Graphs

/** Streaming near-dup CLUSTER-MAP maintenance — [[Graphs.ccDelta]] served
  * as the production ingest loop: delta edge batches arrive as a stream,
  * and each micro-batch folds into the standing label table WITHOUT
  * re-touching history edges (resolve-to-roots + contracted CC +
  * broadcast relabel, cost ∝ batch). The fold invariant is "labels =
  * CC over every edge seen so far, over all ids": ccDelta preserves it
  * per batch (contraction preserves connectivity; labels stay canonical
  * min-member-id), so the final map is row-equal to batch CC over the
  * full edge set HOWEVER the stream is split into micro-batches —
  * StreamingCcDeltaSpec pins the invariance, q207 gates the result
  * against the full-graph recursive-CTE oracle.
  *
  * State is the label table itself, carried between batches as an
  * eagerly local-checkpointed frame (lineage truncated per fold — the
  * predecessor unpersists only after the successor is materialized). A
  * long-lived deployment would instead persist the labels to its lake
  * table per batch inside the same foreachBatch (idempotent via batchId,
  * the standard foreachBatch exactly-once recipe) — the fold itself is
  * identical; this in-memory carrier keeps the registry query
  * self-contained.
  */
object StreamingCcDelta {

  /** Run `edgeStream` (columns: two node ids) to completion under
    * AvailableNow, folding each micro-batch into `initialLabels` via
    * [[Graphs.ccDelta]]; returns the final (idCol, cluster_id) map.
    * `ids` must cover every node of history ∪ all deltas. */
  def maintain(edgeStream: DataFrame, initialLabels: DataFrame,
      ids: DataFrame, checkpoint: String,
      idCol: String = "doc_id"): DataFrame = {
    // the fold state: materialized + lineage-truncated so K batches never
    // stack K plans (the per-round localCheckpoint lesson from the CC
    // loop itself); holder is synchronized — foreachBatch calls are
    // sequential by contract, the lock just makes that assumption loud
    val state = new AnyRef {
      var labels: DataFrame = initialLabels.localCheckpoint()
      def fold(batch: DataFrame): Unit = synchronized {
        val next = Graphs.ccDelta(labels, batch, ids, idCol)
          .localCheckpoint() // eager: materialized before prev is freed
        val prev = labels
        labels = next
        // Dataset.unpersist would be a NO-OP here: localCheckpoint
        // persists the underlying RDD, not a CacheManager entry — free
        // the superseded label table's blocks explicitly, or a long run
        // accumulates one corpus-sized copy per batch until weak-ref GC
        Graphs.freeLocalCheckpoint(prev)
      }
    }
    val q = edgeStream.writeStream
      .foreachBatch((batch: Dataset[Row], _: Long) => state.fold(batch.toDF()))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.labels
  }
}
