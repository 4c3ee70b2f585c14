package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
import org.apache.spark.sql.types.{StructField, StructType}

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
  *     tombstones; the repair also DROPS every remap entry whose target
  *     lies in an affected component — all members that resolved
  *     through such an entry were just overridden or removed, so the
  *     entry is dead, and dropping it is what makes the single read
  *     formula sound;
  *   - READ: label = remap(coalesce(override, base_root, own id)) over
  *     ids ∖ tombstones. Override-then-remap is the correct order
  *     because a remap entry created AFTER a repair legitimately
  *     re-points the repaired labels (add-merge onto a repaired
  *     component), while entries from BEFORE a repair are dropped by
  *     the repair itself;
  *   - an add edge touching a removed id is DROPPED — takedown is
  *     permanent, and without the filter a dangling endpoint would
  *     resurrect as a fresh node (spec-pinned). Recent removals are the
  *     driver-side tombstone set; removals already folded by a past
  *     compaction are detected by ABSENCE from the compacted id
  *     universe (one broadcast-semi probe of the batch's endpoints
  *     against it — a read-only scan of a persisted layer, same cost
  *     class as the endpoint-root lookup the add fold already pays).
  *
  * EVERY standing layer is bounded over the stream's lifetime (the r15
  * verdict's one `weak` finding against the previous carrier, which
  * accumulated one edge frame per batch forever and kept tombstones in
  * driver memory forever):
  *
  *   - added edges accumulate as per-batch localCheckpointed frames,
  *     but the frame LIST is capped at [[EdgeFrameCap]]: when it fills,
  *     the frames coalesce into the ONE standing edge frame (filtered
  *     of tombstone-touching edges — they can never matter again), so
  *     `allEdges` is O(1) frames and O(1) plan depth in batch count
  *     (StreamingCcMixedSpec pins the cap across 4·cap batches);
  *   - COMPACTION folds remap + override + tombstones into a new base
  *     when the combined layer size (INCLUDING the driver tombstone
  *     set) passes `compactBound`, and coalesces the edge layer; the
  *     driver tombstone set CLEARS — the compacted base covers exactly
  *     the retained universe, so a folded removal is thereafter visible
  *     as absence, and the no-resurrection probe above takes over.
  *
  * Per-batch cost: ∝ batch + read-only scans of the persisted layers —
  * never a corpus rewrite outside compaction.
  *
  * `persistDir` (optional) makes the mixed state survive a driver
  * crash via the shared [[EpochSnapshots]] scheme:
  * `base/<epoch>/` parquet (epoch −1 = initial labels, epoch N = the
  * compaction done while folding batch N), `edges/<epoch>/` parquet
  * (the coalesced standing edge frame, written ONLY at compaction —
  * before the first compaction the static history pairs plus the
  * per-batch `added/<batchId>/` frames reconstruct it),
  * `added/<batchId>/` parquet (the batch's filtered add edges, bounded
  * by the batch), and `state/<batchId>/` parquet (ONE tagged frame:
  * "r" remap entries, "o" override rows, "t" tombstones — all bounded
  * by `compactBound`). Every write is an idempotent per-batchId
  * overwrite; recovery takes the newest snapshot M, the newest base
  * epoch ≤ M (orphans from a torn compaction are ignored and redone by
  * the replay), the newest edges epoch ≤ M, and the added frames in
  * between; a replayed fold at or below M is SKIPPED
  * ([[EpochSnapshots.alreadyApplied]]). MixedPersistRestartSpec pins
  * the crash-and-recover paths, torn compaction and forced replay
  * included. If `persistDir` already holds a recoverable state it is
  * resumed and `initialLabels` is IGNORED — pair it with the same
  * `checkpoint` for the stream's lifetime. */
object StreamingCcMixed {

  /** Max per-batch added-edge frames held before they coalesce into the
    * standing edge frame — the shared [[EpochSnapshots.FrameCap]]. */
  val EdgeFrameCap: Int = EpochSnapshots.FrameCap

  /** Run `opStream` (columns: op STRING 'add'|'rm', a, b — `b` ignored
    * for 'rm') to completion under AvailableNow against `initialLabels`
    * and the static history edge set `histPairs`; returns the final
    * retained (idCol, cluster_id) map. `ids` must cover every node of
    * history ∪ all adds. */
  def maintain(opStream: DataFrame, initialLabels: DataFrame,
      histPairs: DataFrame, ids: DataFrame, checkpoint: String,
      idCol: String = "doc_id", compactBound: Int = 10000,
      persistDir: Option[String] = None): DataFrame =
    maintainState(opStream, initialLabels, histPairs, ids, checkpoint,
      idCol, compactBound, persistDir).read

  /** [[maintain]] returning the live state carrier — the spec hook that
    * lets StreamingCcMixedSpec pin the O(1)-frames edge-layer bound. */
  private[streaming] def maintainState(opStream: DataFrame,
      initialLabels: DataFrame, histPairs: DataFrame, ids: DataFrame,
      checkpoint: String, idCol: String, compactBound: Int,
      persistDir: Option[String]): MixedState = {
    val spark = opStream.sparkSession
    val recovered = persistDir.flatMap(d => loadPersisted(spark, d))
    val state = new MixedState(spark,
      recovered.map(_.base).getOrElse(initialLabels),
      histPairs, ids, idCol, compactBound, persistDir,
      recovered)
    if (recovered.isEmpty)
      persistDir.foreach(d => state.persistBase(d, -1L))
    EpochSnapshots.runAvailableNow(opStream, checkpoint)(state.fold)
    state
  }

  /** Everything [[loadPersisted]] recovers. `baseIsUniverse` is true
    * exactly when the recovered base epoch is a compaction (≥ 0): a
    * compacted base covers the full retained id universe, so the member
    * layer reads it directly and folded removals show as absence. */
  private[streaming] final case class Recovered(through: Long,
      base: DataFrame, baseIsUniverse: Boolean, edges: Option[DataFrame],
      added: Seq[DataFrame], remap: Seq[(Any, Any)],
      overrideRows: Seq[Row], tomb: Seq[Any])

  /** Recover the mixed state from a [[maintain]] `persistDir`; None when
    * no snapshot has ever landed (fresh start). */
  private[streaming] def loadPersisted(spark: SparkSession, dir: String)
      : Option[Recovered] =
    EpochSnapshots.load(spark, dir, "StreamingCcMixed",
      primarySub = "base", secondarySubs = Seq("edges"),
      addedGateSub = "edges").map { l =>
      val remap = l.stateRows.filter(_.getString(0) == "r")
        .map(r => r.get(1) -> r.get(2))
      val ov = l.stateRows.filter(_.getString(0) == "o")
        .map(r => Row(r.get(1), r.get(2)))
      val tb = l.stateRows.filter(_.getString(0) == "t").map(_.get(1))
      Recovered(l.through, l.primary,
        baseIsUniverse = l.primaryEpoch >= 0, l.secondary.get("edges"),
        l.added, remap, ov, tb)
    }

  private[streaming] final class MixedState(spark: SparkSession,
      initialLabels: DataFrame, histPairs: DataFrame, ids: DataFrame,
      idCol: String, compactBound: Int, persistDir: Option[String],
      recovered: Option[Recovered]) {

    private val idType = initialLabels.schema(idCol).dataType
    private val clusterType = initialLabels.schema("cluster_id").dataType
    // cluster ids ARE node ids (canonical label = min member id), and
    // the snapshot's tagged frame stores remap TARGETS in the shared
    // cluster_id slot: a divergent cluster_id type would round-trip
    // remap values back into a frame declared idType with a mismatched
    // runtime type (failure or silent coercion on recovery)
    require(clusterType == idType,
      s"StreamingCcMixed: cluster_id type $clusterType must equal " +
        s"$idCol type $idType — labels are canonical member ids")
    private val recoveredThrough =
      recovered.map(_.through).getOrElse(Long.MinValue)
    // eager localCheckpoint: every recovered frame is materialized
    // before the stream starts (EpochSnapshots' contract)
    private var base = initialLabels
      .select(col(idCol), col("cluster_id")).transform(Graphs.flatCheckpoint(_))
    // true once base covers exactly the retained id universe (any
    // compaction establishes it): the member layer then derives from
    // base alone and folded removals are visible as absence
    private var baseIsUniverse =
      recovered.exists(_.baseIsUniverse)
    private val remap = mutable.LinkedHashMap.empty[Any, Any] ++
      recovered.map(_.remap).getOrElse(Seq.empty)
    // the member-grain override lives DRIVER-side in the shared ledger
    // while every repair stays inside the union-find bound (its rows
    // were solved driver-side anyway); a giant blast radius spills it
    // to a distributed frame. Pre-r19 every removal fold paid a
    // localCheckpoint + count() to maintain a distributed copy.
    private val overrides = new EpochSnapshots.OverrideLedger(spark,
      StructType(Seq(StructField(idCol, idType),
        StructField("cluster_id", clusterType))),
      recovered.map(_.overrideRows).getOrElse(Seq.empty))
    private val tomb = mutable.LinkedHashSet.empty[Any] ++
      recovered.map(_.tomb).getOrElse(Seq.empty)
    // ---- the edge layer: ONE standing frame + a capped recent list ----
    private val edges = new EpochSnapshots.FrameLedger(
      recovered.flatMap(_.edges)
        .getOrElse(histPairs.toDF("__a", "__b")),
      initiallyOwned = false)
    // a recovery's added frames are LAZY parquet reads — coalesce them
    // into owned blocks now (one-time recovery cost) before the stream
    // starts
    recovered.map(_.added).getOrElse(Seq.empty).foreach(edges.append)
    if (edges.hasRecent) coalesceEdges()
    // the pre-compaction universe (ids ⟕ base, own id when absent) is
    // MATERIALIZED ONCE: it changes only at compaction, yet every view
    // execution re-ran the corpus×corpus join — the single biggest
    // per-fold cost in the r18 fold profile. Post-compaction base IS
    // the universe and the cache aliases it (universeOwned guards the
    // double-free).
    private var universe: DataFrame =
      if (baseIsUniverse) base
      else ids
        .join(base.select(col(idCol), col("cluster_id").as("__b")),
          Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("__b"), col(idCol)).as("cluster_id"))
        .transform(EpochSnapshots.materializeStanding(_))
    private var universeOwned = !baseIsUniverse

    private[streaming] def edgeFrameCount: Int =
      synchronized(edges.frameCount)

    private def idDf(vals: Seq[Any], name: String): DataFrame =
      EpochSnapshots.localFrame(spark, vals.map(Row(_)),
        StructType(Seq(StructField(name, idType))))

    private def remapDfOpt: Option[DataFrame] =
      if (remap.isEmpty) None
      else Some(EpochSnapshots.localFrame(spark,
        remap.toSeq.map { case (k, v) => Row(k, v) },
        StructType(Seq(StructField("__cn", idType),
          StructField("__new", idType)))))

    /** The member layer: (universe ∖ tomb) ⟕ override — own id for
      * nodes absent from base (possible only pre-compaction, when base
      * is the caller's initial labels over a subset of `ids`; the
      * joined universe is cached — see the field). Remap applies on
      * top. */
    private def memberLayer: DataFrame = {
      val retained =
        if (tomb.isEmpty) universe
        else universe.join(broadcast(idDf(tomb.toSeq, idCol)),
          Seq(idCol), "left_anti")
      overrides.frame match {
        case None => retained
        // broadcast: the override is compactBound-bounded — without
        // the hint (stats-flattened checkpoint leaf after a spill)
        // every view execution shuffled the corpus side into a
        // sort-merge join
        case Some(o) => retained
          .join(broadcast(
              o.select(col(idCol), col("cluster_id").as("__o"))),
            Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("__o"), col("cluster_id")).as("cluster_id"))
      }
    }

    /** The full view: member layer with the remap applied. */
    private def view: DataFrame =
      Graphs.composeLabels(memberLayer, remapDfOpt,
        memberLayer.select(col(idCol)), idCol)

    private def allEdges: DataFrame = edges.union

    /** Coalesce the standing frame + recent per-batch frames into ONE
      * owned frame, dropping edges touching a current tombstone (such
      * an edge can never matter again: the view excludes the id and
      * the no-resurrection filter keeps it out forever). Runs when the
      * recent list fills ([[EdgeFrameCap]]), at compaction, and once at
      * recovery — never per batch. */
    private def coalesceEdges(): Unit = {
      var merged = allEdges
      if (tomb.nonEmpty) {
        val t = broadcast(idDf(tomb.toSeq, "__t"))
        merged = merged
          .join(t.select(col("__t").as("__a")), Seq("__a"), "left_anti")
          .join(t.select(col("__t").as("__b")), Seq("__b"), "left_anti")
          .select(col("__a"), col("__b"))
      }
      edges.reset(EpochSnapshots.materializeStanding(merged))
    }

    /** Endpoints (of the batch's add edges) removed by a PAST
      * compaction — visible only as absence from the compacted
      * universe; one broadcast-semi probe (read-only base scan, output
      * ≤ 2·|batch| — the bounded-collect class). Pre-compaction the
      * driver tombstone set is complete and the probe is skipped. */
    private def foldedDeadEndpoints(eps: Seq[Any]): Set[Any] = {
      if (!baseIsUniverse || eps.isEmpty) return Set.empty
      val alive = base
        .join(broadcast(idDf(eps, idCol)), Seq(idCol), "left_semi")
        .select(col(idCol)).collect()
        .map(r => Graphs.wrapKey(r.get(0))).toSet
      eps.filterNot(x => alive(Graphs.wrapKey(x))).toSet
    }

    def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (EpochSnapshots.alreadyApplied(recoveredThrough, batchId,
        "StreamingCcMixed")) return
      // ---- ONE collect over the whole op batch (∝ batch — the same
      // bounded class as the add-pair + removal collects this fold
      // always ran as TWO executions; r19 fuses them, the split is
      // driver-side) -------------------------------------------------
      val opRows = batch.select(col("op"), col("a"), col("b"))
        .collect().toSeq
      // ---- adds: root-remap fold (StreamingCcDelta's shape) ----------
      // the dead-endpoint filter runs driver-side: the pre-r18
      // plan-side path paid a checkpoint + count + anti-join chain of
      // tiny jobs per fold on data this size (r17 verdict next-round #2)
      val addPairs0 = opRows.iterator.filter(_.getString(0) == "add")
        .map(r => Row(r.get(1), r.get(2))).toSeq
      val eps = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        for (r <- addPairs0; x <- Seq(r.get(0), r.get(1)))
          seen.getOrElseUpdate(Graphs.wrapKey(x), x)
        seen.values.toSeq
      }
      // no resurrection: an edge touching a removed id is dropped —
      // recent removals via the driver tombstone set, folded removals
      // via absence from the compacted universe
      val dead = tomb.map(Graphs.wrapKey) ++
        foldedDeadEndpoints(eps).map(Graphs.wrapKey)
      val addPairs = addPairs0.filterNot(r =>
        dead(Graphs.wrapKey(r.get(0))) || dead(Graphs.wrapKey(r.get(1))))
      if (addPairs.nonEmpty) {
        val frame = EpochSnapshots.localFrame(spark, addPairs,
          StructType(Seq(StructField("__a", idType),
            StructField("__b", idType))))
        edges.append(frame)
        persistDir.foreach(d => EpochSnapshots.persistEpoch(frame,
          d, "added", batchId, bounded = true))
        val fresh = Graphs
          .ccDeltaRemap(memberLayer, remapDfOpt,
            frame.select(col("__a").as("a"), col("__b").as("b")), idCol)
          .collect().map(r => r.get(0) -> r.get(1)).toSeq
        if (fresh.nonEmpty) {
          val nm = fresh.toMap
          for ((k, v) <- remap.toSeq) remap(k) = nm.getOrElse(v, v)
          for ((k, v) <- fresh if !remap.contains(k)) remap(k) = v
        }
        if (edges.overCap) coalesceEdges()
      }
      // ---- removes: member-override fold (Takedown's shape) ----------
      val removals = {
        val seen = mutable.LinkedHashMap.empty[Any, Any]
        opRows.iterator.filter(_.getString(0) == "rm")
          .foreach(r => seen.getOrElseUpdate(Graphs.wrapKey(r.get(1)),
            r.get(1)))
        seen.values.toSeq
      }
      if (removals.nonEmpty) {
        val remDf = idDf(removals, idCol)
        // the driver-held removal values let the repair fuse its
        // affected/member probes into one execution; its resolved rows
        // come back driver-side in the bounded case and the ledger
        // merge costs no job
        val repair = Graphs.ccRetractRepair(view, allEdges, remDf,
          idCol, removedVals = Some(removals))
        // drop dead remap entries: anything resolving INTO an affected
        // component was just overridden or removed
        val aff = repair.affectedVals.toSet
        if (aff.nonEmpty)
          remap.filterInPlace { case (_, v) => !aff.contains(v) }
        repair.resolvedRows match {
          case Some(rows) => overrides.merge(rows, removals)
          case None => overrides.spill(repair.resolved, removals)
        }
        tomb ++= removals
      }
      if (remap.size + overrides.size + tomb.size > compactBound)
        compact(batchId)
      persistDir.foreach(d => persistSnapshot(d, batchId))
    }

    /** Fold remap + override + tombstones into a new base and coalesce
      * the edge layer — the only corpus-sized rewrite. After it, base
      * covers exactly the retained universe, so the tombstone set
      * CLEARS (folded removals are thereafter visible as absence, which
      * is what [[foldedDeadEndpoints]] probes) — no layer grows with
      * the stream's lifetime. */
    private def compact(batchId: Long): Unit = {
      val next = EpochSnapshots.materializeStanding(view)
      // coalesce WHILE tomb is still populated — the edge filter is the
      // last chance to drop this epoch's dead edges from the standing
      // frame (afterwards the ids are visible only as base-absence)
      coalesceEdges()
      Graphs.freeLocalCheckpoint(base)
      if (universeOwned) Graphs.freeLocalCheckpoint(universe)
      base = next
      universe = base // compacted base covers the retained universe
      universeOwned = false
      baseIsUniverse = true
      remap.clear()
      overrides.clear()
      tomb.clear()
      persistDir.foreach { d =>
        persistBase(d, batchId)
        EpochSnapshots.persistEpoch(edges.union, d, "edges", batchId)
      }
    }

    def persistBase(dir: String, epoch: Long): Unit =
      EpochSnapshots.persistEpoch(base, dir, "base", epoch)

    /** One tagged frame per snapshot — remap ("r"), override ("o"), and
      * tombstone ("t") rows, all bounded by `compactBound`; overwrite
      * makes replays idempotent. The override leg stays DISTRIBUTED (a
      * plan over its checkpointed blocks — never collected). */
    private def persistSnapshot(dir: String, batchId: Long): Unit = {
      val emptyOv = EpochSnapshots.localFrame(spark, Seq.empty,
        StructType(Seq(StructField(idCol, idType),
          StructField("cluster_id", clusterType))))
      val rDf = EpochSnapshots.localFrame(spark,
        remap.toSeq.map { case (k, v) => Row(k, v) },
        StructType(Seq(StructField(idCol, idType),
          StructField("cluster_id", idType))))
      EpochSnapshots.persistEpoch(
        overrides.frame.getOrElse(emptyOv)
          .select(lit("o").as("kind"), col(idCol), col("cluster_id"))
          .unionAll(rDf.select(lit("r").as("kind"), col(idCol),
            col("cluster_id")))
          .unionAll(idDf(tomb.toSeq, idCol)
            .select(lit("t").as("kind"), col(idCol),
              lit(null).cast(clusterType).as("cluster_id"))),
        dir, "state", batchId, bounded = true)
    }

    def read: DataFrame = synchronized(view)
  }
}
