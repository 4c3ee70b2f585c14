package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.analytics.Graphs

/** MIXED streaming maintenance for the standing IVF POSTING TABLE — the
  * retraction matrix's last quadrant (r16 verdict, next-round #2): the
  * digest index (q217) and the cluster map (q216) already have mixed
  * add/remove maintainers; the ANN index had only the add leg served
  * online (q205) and batch tombstone serving (q214). ONE stream
  * interleaves vector ADDS and takedown REMOVES against the standing
  * posting table (idCol, cell, e) built under FROZEN centroids — the
  * production stance of every serving system: assignment is a deployed
  * artifact, deletion must not retrain it
  * ([[graft.similarity.Similarity.ivfTombstoneTopK]]'s contract).
  *
  * The fold invariant is "view = postings over (history ∪ added
  * vectors) ∖ removed ids", so the final table is row-equal to the
  * retained-corpus index rebuild HOWEVER the ops split into
  * micro-batches (removal wins same-batch add+rm; takedown is
  * permanent — a re-add of a removed id is dropped, the
  * no-resurrection rule shared with [[StreamingIndexMaint]]).
  * StreamingIvfMixedSpec pins split-invariance, same-batch shapes,
  * no-resurrection, and both compaction regimes; q221 gates the sf
  * pipeline against q214's retained-corpus oracle VERBATIM (batch
  * tombstone serving and streamed mixed maintenance land on one ground
  * truth).
  *
  * Per-batch fold, cost ∝ batch (never a posting-table rewrite outside
  * compaction):
  *
  *   - ADDS: the caller's `mkPostings` assigns the batch's vectors
  *     against the frozen centroids (a shuffle-free codegen'd map
  *     stage — stream and batch assign identically); rows for ids
  *     removed at ANY earlier point (or in THIS batch) are DROPPED.
  *     The assigned rows append as one bounded frame.
  *   - REMOVES: ids fold into the driver-side recent-removals set
  *     (takedown sets are tiny — the bounded-collect class) and
  *     anti-join the view at read time; a PAST compaction's removals
  *     are visible as absence plus the standing removed frame (probed
  *     only by add batches, one broadcast semi-join ≤ |batch|).
  *
  * Standing layers are bounded over the stream's lifetime: added
  * frames coalesce into ONE owned frame at
  * [[EpochSnapshots.FrameCap]], recent removals fold into a new base
  * at `compactBound` (the only index-sized rewrite —
  * [[graft.similarity.Similarity.compactPostings]]' amortization
  * argument), and removed ids persist as a frame sized by TOTAL
  * takedown volume (the permanent-takedown floor).
  *
  * `persistDir` (optional) uses the shared [[EpochSnapshots]] scheme:
  * `postings/<epoch>` + `removed/<epoch>` at compactions (epoch −1 =
  * initial postings only), `added/<batchId>` per add batch (the
  * ASSIGNED rows — recovery never re-runs assignment),
  * `state/<batchId>` one bounded recent-removals frame per fold;
  * idempotent per-batchId overwrites, recovery takes the newest
  * snapshot and the newest epochs ≤ it, and a replayed fold at or
  * below the recovered snapshot is SKIPPED
  * ([[EpochSnapshots.alreadyApplied]] — the r17 advisor's double-count
  * fix; pair `persistDir` with the same stream `checkpoint` for the
  * stream's lifetime). Recovered frames are EAGERLY materialized.
  * IvfMixedPersistRestartSpec pins the crash-and-recover paths,
  * forced replay included. */
object StreamingIvfMixed {

  /** Added-posting frames coalesce into one owned frame past this —
    * the member view stays O(1) frames regardless of batch count
    * (the shared [[EpochSnapshots.FrameCap]]). */
  val PostingFrameCap: Int = EpochSnapshots.FrameCap

  /** Run `opStream` (column `op` STRING 'add'|'rm' + the payload
    * columns `mkPostings` needs; 'rm' rows are read only at `idCol`)
    * to completion under AvailableNow against the standing
    * `initialPostings` (idCol, cell, e); returns the final retained
    * posting table. `mkPostings` must map add rows to assigned posting
    * rows (idCol, cell, e) — the frozen-centroid assignment stage. */
  def maintain(opStream: DataFrame, initialPostings: DataFrame,
      checkpoint: String, idCol: String,
      mkPostings: DataFrame => DataFrame, compactBound: Int = 10000,
      persistDir: Option[String] = None): DataFrame =
    maintainState(opStream, initialPostings, checkpoint, idCol,
      mkPostings, compactBound, persistDir).read

  /** [[maintain]] returning the live state carrier — the spec hook for
    * the O(1)-frames layer bound. */
  private[streaming] def maintainState(opStream: DataFrame,
      initialPostings: DataFrame, checkpoint: String, idCol: String,
      mkPostings: DataFrame => DataFrame, compactBound: Int,
      persistDir: Option[String]): IvfState = {
    val spark = opStream.sparkSession
    val recovered = persistDir.flatMap(d => loadPersisted(spark, d))
    val state = new IvfState(spark,
      recovered.map(_.postings).getOrElse(initialPostings), idCol,
      compactBound, persistDir, recovered)
    if (recovered.isEmpty)
      persistDir.foreach(d => state.persistPostings(d, -1L))
    EpochSnapshots.runAvailableNow(opStream, checkpoint)(
      (b, id) => { state.fold(b, id, mkPostings); () })
    state
  }

  private[streaming] final case class Recovered(through: Long,
      postings: DataFrame, removed: Option[DataFrame],
      added: Seq[DataFrame], removedRecent: Seq[Any])

  private[streaming] def loadPersisted(spark: SparkSession, dir: String)
      : Option[Recovered] =
    EpochSnapshots.load(spark, dir, "StreamingIvfMixed",
      primarySub = "postings", secondarySubs = Seq("removed"),
      addedGateSub = "postings").map { l =>
      Recovered(l.through, l.primary, l.secondary.get("removed"),
        l.added, l.stateRows.map(_.get(0)))
    }

  private[streaming] final class IvfState(spark: SparkSession,
      initialPostings: DataFrame, idCol: String, compactBound: Int,
      persistDir: Option[String], recovered: Option[Recovered]) {

    private val idType = initialPostings.schema(idCol).dataType
    private val postingCols: Seq[String] = Seq(idCol, "cell", "e")
    private val recoveredThrough =
      recovered.map(_.through).getOrElse(Long.MinValue)

    // eager checkpoints throughout: every recovered frame is
    // materialized before the stream starts (EpochSnapshots' contract)
    private val postings = new EpochSnapshots.FrameLedger(
      initialPostings.select(postingCols.map(col): _*)
        .transform(Graphs.flatCheckpoint(_)),
      initiallyOwned = true)
    private val removedStanding =
      new EpochSnapshots.RemovedSlot(recovered.flatMap(_.removed))
    private val removedRecent = mutable.LinkedHashSet.empty[Any] ++
      recovered.map(_.removedRecent).getOrElse(Seq.empty)
    recovered.map(_.added).getOrElse(Seq.empty).foreach(postings.append)
    if (postings.hasRecent) coalescePostings()

    private[streaming] def postingFrameCount: Int =
      synchronized(postings.frameCount)

    private def idDf(vals: Seq[Any]): DataFrame =
      EpochSnapshots.localFrame(spark, vals.map(Row(_)),
        StructType(Seq(StructField(idCol, idType))))

    /** The retained posting table: (standing ∪ adds) ∖ recent removals
      * (folded removals are already absent from the standing frame). */
    private def view: DataFrame = {
      val all = postings.union
      if (removedRecent.isEmpty) all
      else all.join(broadcast(idDf(removedRecent.toSeq)),
          Seq(idCol), "left_anti")
        // using-joins front the join column — restore posting order
        .select(postingCols.map(col): _*)
    }

    /** Coalesce standing + added frames into ONE owned frame, dropping
      * currently-tombstoned rows (they can never re-enter — the
      * no-resurrection filter is permanent; the ids stay in
      * `removedRecent` until compaction folds them into the standing
      * removed frame). */
    private def coalescePostings(): Unit =
      postings.reset(EpochSnapshots.materializeStanding(view))

    /** Batch ids removed by a PAST compaction — one broadcast-semi
      * probe of the standing removed frame, output ≤ |batch|. */
    private def foldedRemoved(ids: Seq[Any]): Set[Any] =
      removedStanding.get match {
        case None => Set.empty
        case Some(rs) =>
          if (ids.isEmpty) Set.empty
          else rs.join(broadcast(idDf(ids)), Seq(idCol), "left_semi")
            .select(col(idCol)).collect().map(_.get(0)).toSet
      }

    /** Apply one op batch; returns the RETAINED assigned add rows
      * (idCol, cell, e) when the batch contributed any — the monitor
      * hook for [[StreamingIvfRetrain]] (what actually ENTERED the
      * index, post no-resurrection filter; a fully-dropped add batch
      * returns None and must not fire a drift monitor).
      *
      * `beforeCommit` runs with that same option AFTER the batch is
      * fully applied but BEFORE the fold's `state/<batchId>` write —
      * so everything a consumer persists inside it (a retrain swap's
      * quantizer/monitor/re-encoded artifacts) sits UNDER the
      * state-last replay rule: `state/<batchId>` present proves the
      * hook's persists landed too, and a torn hook leaves only
      * orphan epochs > the newest snapshot, which recovery ignores
      * and the replayed fold redoes. Skipped replays never invoke
      * it. */
    def fold(batch: DataFrame, batchId: Long,
        mkPostings: DataFrame => DataFrame,
        beforeCommit: Option[DataFrame] => Unit = _ => ())
        : Option[DataFrame] = synchronized {
      if (EpochSnapshots.alreadyApplied(recoveredThrough, batchId,
        "StreamingIvfMixed")) return None
      // ---- ONE collect over the op batch (was two executions): the
      // assigned add rows ("a") ride tagged alongside the rm ids ("r")
      // — both ∝ batch, the same bounded class as the two collects this
      // fold always ran; the frozen-centroid assignment map stage runs
      // exactly once, the dead-id filter is driver-side, and the
      // appended posting frame is a local relation with exact stats
      // (the CcMixed/IndexMaint one-collect treatment, Ivf edition).
      // (A pre-assignment batch fan-out was tried here — r19: the
      // repartition's exchange cost more than the single-task
      // assignment it parallelized at bench scale; q221 subset
      // 3.8 s → 5.0 s, reverted. At real batch sizes the caller can
      // fan out inside mkPostings where measurement justifies it.)
      val addPlan = mkPostings(batch.where(col("op") === "add")
          .drop("op"))
        .select(postingCols.map(col): _*)
      val addSchema = addPlan.schema
      import org.apache.spark.sql.functions.lit
      val opRows = addPlan
        .select(lit("a").as("__kind") +: postingCols.map(col): _*)
        .unionAll(batch.where(col("op") === "rm")
          .select(col(idCol)).distinct()
          .select(lit("r").as("__kind"), col(idCol),
            lit(null).cast(addSchema("cell").dataType).as("cell"),
            lit(null).cast(addSchema("e").dataType).as("e")))
        .collect()
      // removes FIRST: removal wins a same-batch add+rm (the rebuild
      // oracle's set-minus semantics)
      val removals: Seq[Any] = opRows.iterator
        .filter(_.getString(0) == "r").map(_.get(1)).toSeq
      removedRecent ++= removals
      val addRows0 = opRows.iterator.filter(_.getString(0) == "a")
        .map(r => Row.fromSeq(r.toSeq.tail)).toSeq
      val batchIds = {
        val seen = mutable.LinkedHashMap.empty[Any, Any]
        for (r <- addRows0)
          seen.getOrElseUpdate(Graphs.wrapKey(r.get(0)), r.get(0))
        seen.values.toSeq
      }
      val dead = batchIds.filter(removedRecent.contains).toSet ++
        foldedRemoved(batchIds)
      val deadWrapped = dead.map(Graphs.wrapKey)
      val liveRows = addRows0.filterNot(r =>
        deadWrapped.contains(Graphs.wrapKey(r.get(0))))
      val addRows = EpochSnapshots.localFrame(spark, liveRows, addSchema)
      val contributed = liveRows.nonEmpty
      if (contributed) {
        persistDir.foreach(d => EpochSnapshots.persistEpoch(addRows,
          d, "added", batchId, bounded = true))
        postings.append(addRows)
        if (postings.overCap) coalescePostings()
      }
      if (removedRecent.size > compactBound) compact(batchId)
      val result = if (contributed) Some(addRows) else None
      beforeCommit(result)
      persistDir.foreach(d => EpochSnapshots.persistEpoch(
        idDf(removedRecent.toSeq), d, "state", batchId, bounded = true))
      result
    }

    /** EPOCH SWAP support ([[StreamingIvfRetrain]]): rebuild the
      * posting layer by re-assigning the retained view's vectors under
      * a NEW frozen quantizer — the only legitimate whole-table
      * rewrite besides compaction, and it IS a compaction for the
      * removal layers (recent removals fold into the standing removed
      * frame, so no-resurrection crosses the epoch boundary intact —
      * spec-pinned). `mk` is the new epoch's assignment stage over
      * (idCol, e) rows. */
    def reencode(mk: DataFrame => DataFrame, batchId: Long): Unit =
        synchronized {
      val next = EpochSnapshots.materializeStanding(
        mk(view.select(col(idCol), col("e")))
          .select(postingCols.map(col): _*))
      postings.reset(next)
      if (removedRecent.nonEmpty) {
        removedStanding.merge(idDf(removedRecent.toSeq))
        removedRecent.clear()
      }
      persistDir.foreach { d =>
        persistPostings(d, batchId)
        removedStanding.write(d, "removed", batchId)
      }
    }

    /** Fold recent removals into a new base — the only posting-sized
      * rewrite ([[graft.similarity.Similarity.compactPostings]]'
      * amortization); recent removals fold into the standing removed
      * frame (the permanent-takedown floor). */
    private def compact(batchId: Long): Unit = {
      coalescePostings() // view filters removedRecent — the fold
      if (removedRecent.nonEmpty)
        removedStanding.merge(idDf(removedRecent.toSeq))
      removedRecent.clear()
      persistDir.foreach { d =>
        persistPostings(d, batchId)
        removedStanding.write(d, "removed", batchId)
      }
    }

    def persistPostings(dir: String, epoch: Long): Unit =
      EpochSnapshots.persistEpoch(postings.union, dir, "postings",
        epoch)

    def read: DataFrame = synchronized(view)
  }
}
