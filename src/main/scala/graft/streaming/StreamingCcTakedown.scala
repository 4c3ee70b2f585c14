package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col}
import org.apache.spark.sql.streaming.Trigger

import graft.analytics.Graphs

/** Streaming cluster-map TAKEDOWN — [[Graphs.ccRetract]] served as the
  * production deletion loop, the remove-stream twin of
  * [[StreamingCcDelta]]'s add-stream: takedown batches (node-id sets)
  * arrive as a stream and each micro-batch repairs the standing label
  * state for exactly the components it touches — removal can SPLIT a
  * component and retire its canonical min, so the repair emits
  * per-MEMBER labels, not a root remap. The fold invariant is
  * "view = CC over the original edges restricted to the retained ids",
  * so the final map is row-equal to the batch retraction however the
  * removal set splits into micro-batches (later batches resolve against
  * the already-repaired view; an edge touching a previously removed
  * node is excluded because that node is no longer IN the view) —
  * StreamingCcTakedownSpec pins the invariance including the
  * same-component-touched-twice split, q215 gates the result against
  * q213's retained-graph recursive-CTE oracle verbatim.
  *
  * State is merge-on-read, the [[StreamingCcDelta]] discipline applied
  * to deletion:
  *
  *   - `base`: the corpus-sized label table, persisted once and only
  *     SCANNED per batch;
  *   - `tomb`: the accumulated removed ids, driver-side (takedown sets
  *     are tiny relative to the corpus — the bounded-collect class) and
  *     broadcast-anti-joined at read;
  *   - `override`: the accumulated repaired (id, cluster_id) rows —
  *     bounded by the takedowns' cumulative blast radius, NOT the
  *     corpus — localCheckpointed per fold (each fold's checkpoint cost
  *     is the override's size); a member repaired again is superseded,
  *     a member removed later is dropped;
  *   - COMPACTION: when the override passes `compactBound`, it and the
  *     tombstones fold into a new base (the only corpus-sized rewrite),
  *     and both reset.
  *
  * Reads go through (base ∖ tomb) ⟕ override — exact at any point. */
object StreamingCcTakedown {

  /** Run `removalStream` (one id column named `idCol`) to completion
    * under AvailableNow, repairing `initialLabels` per batch against the
    * static `pairs` edge set; returns the final retained
    * (idCol, cluster_id) map. */
  def maintain(removalStream: DataFrame, initialLabels: DataFrame,
      pairs: DataFrame, checkpoint: String, idCol: String = "doc_id",
      compactBound: Int = 100000): DataFrame = {
    val state = new TakedownState(removalStream.sparkSession,
      initialLabels, pairs, idCol, compactBound)
    val q = removalStream.writeStream
      .foreachBatch((batch: Dataset[Row], _: Long) =>
        state.fold(batch.toDF()))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.read
  }

  private final class TakedownState(spark: SparkSession,
      initialLabels: DataFrame, pairs: DataFrame, idCol: String,
      compactBound: Int) {

    private var base = initialLabels
      .select(col(idCol), col("cluster_id")).localCheckpoint()
    private val tomb = mutable.LinkedHashSet.empty[Any]
    private var overrideOpt: Option[DataFrame] = None
    private var overrideSize = 0L

    private def tombDf: DataFrame = {
      import org.apache.spark.sql.types.{StructField, StructType}
      val schema = StructType(Seq(
        StructField(idCol, base.schema(idCol).dataType)))
      spark.createDataFrame(java.util.Arrays.asList(
        tomb.toSeq.map(Row(_)): _*), schema)
    }

    /** The current label view: (base ∖ tomb) ⟕ override. */
    private def view: DataFrame = {
      val retained =
        if (tomb.isEmpty) base
        else base.join(broadcast(tombDf), Seq(idCol), "left_anti")
      overrideOpt match {
        case None => retained
        case Some(o) => retained
          .join(o.select(col(idCol), col("cluster_id").as("__ov")),
            Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("__ov"), col("cluster_id")).as("cluster_id"))
      }
    }

    def fold(batch: DataFrame): Unit = synchronized {
      // takedown batches are tiny by nature — the bounded-collect class;
      // the driver-side set is what lets the read anti-join broadcast
      val removals = batch.select(col(idCol)).distinct()
        .collect().map(_.get(0)).toSeq
      if (removals.isEmpty) return
      val remDf = {
        import org.apache.spark.sql.types.{StructField, StructType}
        val schema = StructType(Seq(
          StructField(idCol, base.schema(idCol).dataType)))
        spark.createDataFrame(java.util.Arrays.asList(
          removals.map(Row(_)): _*), schema)
      }
      val (resolved, _) =
        Graphs.ccRetractParts(view, pairs, remDf, idCol)
      // eager: materialized (and its size taken) before predecessors free
      val res = resolved.localCheckpoint()
      overrideOpt match {
        case None =>
          overrideSize = res.count()
          overrideOpt = Some(res)
        case Some(o) =>
          // the new repair supersedes older overrides for re-touched
          // members; overrides for now-removed members drop (they would
          // be tomb-filtered anyway — dropping keeps the table bounded)
          val next = res.unionAll(o
              .join(res.select(col(idCol)), Seq(idCol), "left_anti")
              .join(broadcast(remDf), Seq(idCol), "left_anti"))
            .localCheckpoint()
          overrideSize = next.count() // materializes before frees
          Graphs.freeLocalCheckpoint(o)
          Graphs.freeLocalCheckpoint(res)
          overrideOpt = Some(next)
      }
      tomb ++= removals
      if (overrideSize > compactBound) compact()
    }

    /** Fold tomb + override into a new base — the only corpus-sized
      * rewrite, amortized over `compactBound`-worth of repairs. */
    private def compact(): Unit = {
      val next = view.localCheckpoint()
      Graphs.freeLocalCheckpoint(base)
      overrideOpt.foreach(Graphs.freeLocalCheckpoint)
      base = next
      overrideOpt = None
      overrideSize = 0L
      tomb.clear()
    }

    def read: DataFrame = synchronized(view)
  }
}
