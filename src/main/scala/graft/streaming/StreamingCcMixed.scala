package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.streaming.Trigger

import graft.analytics.Graphs

/** MIXED streaming cluster-map maintenance — the shape a production
  * ingest loop actually has: ONE stream interleaving delta-edge ADDS
  * ([[StreamingCcDelta]]'s job) and takedown REMOVES
  * ([[StreamingCcTakedown]]'s job) against one standing label state.
  * The fold invariant is "view = CC over (history ∪ added edges so far)
  * restricted to retained ids", so the final map is row-equal to the
  * batch computation however the operations split into micro-batches —
  * StreamingCcMixedSpec pins planted interleavings (merge-then-takedown
  * of the same component, same-batch add+remove, takedown-then-remerge)
  * plus randomized mixed schedules; q216 gates the sf pipeline against
  * the retained-full-graph recursive-CTE oracle (q213's VERBATIM — the
  * adds are the q206/q207 delta slice, the removes the q213 slice: four
  * engine routes and DuckDB on one ground truth).
  *
  * State composes BOTH single-op merge-on-read layers over one
  * persisted base, with a precedence rule and a dead-entry drop that
  * keep them consistent:
  *
  *   - adds fold as a driver-side root REMAP (touched current roots →
  *     new canonical root, ≤ 2·|batch| entries — [[Graphs.ccDeltaRemap]]
  *     resolved through the member layer, so an add onto a repaired
  *     component sees its post-repair labels);
  *   - removes fold as a member-grain OVERRIDE (repaired final labels
  *     for the affected components' retained members,
  *     [[Graphs.ccRetractParts]] run against the FULL view) plus
  *     driver-side tombstones; the repair also DROPS every remap entry
  *     whose target lies in an affected component — all members that
  *     resolved through such an entry were just overridden or removed,
  *     so the entry is dead, and dropping it is what makes the single
  *     read formula sound;
  *   - READ: label = remap(coalesce(override, base_root, own id)) over
  *     ids ∖ tombstones. Override-then-remap is the correct order
  *     because a remap entry created AFTER a repair legitimately
  *     re-points the repaired labels (add-merge onto a repaired
  *     component), while entries from BEFORE a repair are dropped by
  *     the repair itself;
  *   - add edges touching a tombstoned id are DROPPED — takedown is
  *     permanent, and without the filter a dangling endpoint would
  *     resurrect as a fresh node (spec-pinned);
  *   - added edges accumulate as per-batch localCheckpointed frames
  *     (the standing graph grows — repairs need component edges), and
  *     COMPACTION folds remap+override into a new base when the
  *     combined layer size passes `compactBound` (tombstones stay —
  *     see the compact scaladoc).
  *
  * Per-batch cost: ∝ batch + read-only scans of the persisted layers —
  * never a corpus rewrite outside compaction. Crash-safe persistence is
  * deliberately left to the single-op maintainers that pioneered the
  * snapshot scheme ([[StreamingCcDelta]]/[[StreamingCcTakedown]]); the
  * mixed state is the same two snapshot shapes side by side. */
object StreamingCcMixed {

  /** Run `opStream` (columns: op STRING 'add'|'rm', a, b — `b` ignored
    * for 'rm') to completion under AvailableNow against `initialLabels`
    * and the static history edge set `histPairs`; returns the final
    * retained (idCol, cluster_id) map. `ids` must cover every node of
    * history ∪ all adds. */
  def maintain(opStream: DataFrame, initialLabels: DataFrame,
      histPairs: DataFrame, ids: DataFrame, checkpoint: String,
      idCol: String = "doc_id", compactBound: Int = 10000): DataFrame = {
    val state = new MixedState(opStream.sparkSession, initialLabels,
      histPairs, ids, idCol, compactBound)
    val q = opStream.writeStream
      .foreachBatch((batch: Dataset[Row], _: Long) =>
        state.fold(batch.toDF()))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.read
  }

  private final class MixedState(spark: SparkSession,
      initialLabels: DataFrame, histPairs: DataFrame, ids: DataFrame,
      idCol: String, compactBound: Int) {

    private val idType = initialLabels.schema(idCol).dataType
    private var base = initialLabels
      .select(col(idCol), col("cluster_id")).localCheckpoint()
    private val remap = mutable.LinkedHashMap.empty[Any, Any]
    private var overrideOpt: Option[DataFrame] = None
    private var overrideSize = 0L
    private val tomb = mutable.LinkedHashSet.empty[Any]
    private val addedFrames = mutable.ArrayBuffer.empty[DataFrame]

    private def idDf(vals: Seq[Any], name: String): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(vals.map(Row(_)): _*),
        StructType(Seq(StructField(name, idType))))

    private def remapDfOpt: Option[DataFrame] =
      if (remap.isEmpty) None
      else Some(spark.createDataFrame(
        java.util.Arrays.asList(
          remap.toSeq.map { case (k, v) => Row(k, v) }: _*),
        StructType(Seq(StructField("__cn", idType),
          StructField("__new", idType)))))

    /** The member layer: (base ∖ tomb) ⟕ override over `ids` — own id
      * for nodes absent from base (new adds). Remap applies on top. */
    private def memberLayer: DataFrame = {
      val retained =
        if (tomb.isEmpty) ids
        else ids.join(broadcast(idDf(tomb.toSeq, idCol)),
          Seq(idCol), "left_anti")
      val withBase = retained
        .join(base.select(col(idCol), col("cluster_id").as("__b")),
          Seq(idCol), "left")
      val withOv = overrideOpt match {
        case None => withBase.withColumn("__o", lit(null).cast(idType))
        case Some(o) => withBase.join(
          o.select(col(idCol), col("cluster_id").as("__o")),
          Seq(idCol), "left")
      }
      withOv.select(col(idCol),
        coalesce(col("__o"), col("__b"), col(idCol)).as("cluster_id"))
    }

    /** The full view: member layer with the remap applied. */
    private def view: DataFrame =
      Graphs.composeLabels(memberLayer, remapDfOpt,
        memberLayer.select(col(idCol)), idCol)

    private def allEdges: DataFrame =
      addedFrames.foldLeft(histPairs.toDF("__a", "__b"))(
        (acc, f) => acc.unionAll(f))

    def fold(batch: DataFrame): Unit = synchronized {
      val b = batch.select(col("op"), col("a"), col("b"))
      // ---- adds: root-remap fold (StreamingCcDelta's shape) ----------
      val tombNow =
        if (tomb.isEmpty) None else Some(broadcast(idDf(tomb.toSeq, "a")))
      val adds0 = b.where(col("op") === "add")
        .select(col("a"), col("b"))
      // no resurrection: an edge touching a tombstoned id is dropped
      val adds = tombNow match {
        case None => adds0
        case Some(t) => adds0
          .join(t, Seq("a"), "left_anti")
          .join(t.select(col("a").as("b")), Seq("b"), "left_anti")
      }
      val addRows = adds.localCheckpoint()
      if (addRows.count() > 0) {
        addedFrames += addRows.select(col("a").as("__a"),
          col("b").as("__b"))
        val fresh = Graphs
          .ccDeltaRemap(memberLayer, remapDfOpt, addRows, idCol)
          .collect().map(r => r.get(0) -> r.get(1)).toSeq
        if (fresh.nonEmpty) {
          val nm = fresh.toMap
          for ((k, v) <- remap.toSeq) remap(k) = nm.getOrElse(v, v)
          for ((k, v) <- fresh if !remap.contains(k)) remap(k) = v
        }
      } else Graphs.freeLocalCheckpoint(addRows)
      // ---- removes: member-override fold (Takedown's shape) ----------
      val removals = b.where(col("op") === "rm")
        .select(col("a").as(idCol)).distinct()
        .collect().map(_.get(0)).toSeq
      if (removals.nonEmpty) {
        val remDf = idDf(removals, idCol)
        val (resolved, affected) =
          Graphs.ccRetractParts(view, allEdges, remDf, idCol)
        val res = resolved.localCheckpoint()
        // drop dead remap entries: anything resolving INTO an affected
        // component was just overridden or removed
        val aff = affected.collect().map(_.get(0)).toSet
        if (aff.nonEmpty)
          remap.filterInPlace { case (_, v) => !aff.contains(v) }
        overrideOpt match {
          case None =>
            overrideSize = res.count()
            overrideOpt = Some(res)
          case Some(o) =>
            val next = res.unionAll(o
                .join(res.select(col(idCol)), Seq(idCol), "left_anti")
                .join(broadcast(remDf), Seq(idCol), "left_anti"))
              .localCheckpoint()
            overrideSize = next.count()
            Graphs.freeLocalCheckpoint(o)
            Graphs.freeLocalCheckpoint(res)
            overrideOpt = Some(next)
        }
        tomb ++= removals
      }
      if (remap.size + overrideSize > compactBound) compact()
    }

    /** Fold remap + override into a new base — the only corpus-sized
      * rewrite. Added-edge frames stay (they are the standing GRAPH —
      * future repairs need component edges), and so do the TOMBSTONES:
      * unlike [[StreamingCcTakedown]] (whose view derives from base, so
      * a compacted base excludes removed ids by construction), the
      * mixed member layer is built over the caller's `ids`, and the
      * no-resurrection add-edge filter needs the set regardless —
      * takedown sets are tiny, keeping them driver-side is free. */
    private def compact(): Unit = {
      val next = view.localCheckpoint()
      Graphs.freeLocalCheckpoint(base)
      overrideOpt.foreach(Graphs.freeLocalCheckpoint)
      base = next
      remap.clear()
      overrideOpt = None
      overrideSize = 0L
    }

    def read: DataFrame = synchronized(view)
  }
}
