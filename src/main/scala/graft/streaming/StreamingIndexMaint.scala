package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit, min, struct}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.analytics.Graphs

/** MIXED streaming maintenance for a standing keep-first digest INDEX —
  * [[graft.dedup.Dedup.retractIndex]]'s pattern served as the
  * production ingest loop, and the r15 verdict's missing piece #3 (the
  * q145 delta-dedup stream was add-only; this is its tombstone-record
  * twin — [[StreamingCcMixed]]'s op add/rm fold transposed from
  * component grain to digest grain): ONE stream interleaves document
  * ADDS and takedown REMOVES against the standing index
  * (keyCol, orderCols…, n_occ — keeper = min (orderCols…) member). The
  * fold invariant is "view = index rebuilt over (history ∪ added docs)
  * ∖ removed docs", so the final index is row-equal to the batch
  * rebuild however the ops split into micro-batches —
  * StreamingIndexMaintSpec pins keeper-handoff, vanish,
  * re-add-after-vanish, no-resurrection, and same-batch add+rm shapes
  * plus randomized schedules; q217 gates the sf pipeline against q212's
  * retained-corpus rebuild oracle VERBATIM (batch retraction and
  * streamed mixed maintenance land on one ground truth).
  *
  * Per-batch fold, cost ∝ batch + read-only scans of the standing
  * layers (never an index or member rewrite outside compaction):
  *
  *   - ADDS: the batch's member rows come from the caller's
  *     `mkMembers` (chunking/normalization stays the batch operator's,
  *     so stream and batch digest identically); rows for docs removed
  *     at ANY earlier point are DROPPED (no resurrection — recent
  *     removals via the driver set, folded ones via one broadcast-semi
  *     probe of the standing removed-docs frame). The touched digests'
  *     CURRENT members are gathered by a broadcast-semi key probe of
  *     the member view and re-elected together with the new rows — so
  *     n_occ and the keeper are always recomputed from the true member
  *     set, never incrementally drifted.
  *   - REMOVES: affected digests are found by a broadcast-semi doc
  *     probe of the member view; their retained members re-elect
  *     (keeper handoff), digests with no retained member VANISH.
  *   - READ: base rows whose key is untouched pass through UNREAD;
  *     touched keys resolve to the override (or drop, if vanished).
  *
  * Every standing layer is bounded over the stream's lifetime (the
  * [[StreamingCcMixed]] discipline): added member frames coalesce into
  * ONE standing frame at [[EpochSnapshots.FrameCap]], the
  * override/vanished/recent-removed layers fold into a new base at
  * `compactBound`, and removed docs persist as a standing frame sized
  * by TOTAL takedown volume (the one thing a permanent-takedown
  * contract cannot forget), not corpus size.
  *
  * `persistDir` (optional) uses the shared [[EpochSnapshots]] scheme:
  * `base/<epoch>/`, `members/<epoch>/`, `removed/<epoch>/` at
  * compactions (epoch −1 = initial index only), `added/<batchId>/`
  * per add batch, `state/<batchId>/` one tagged frame per fold
  * ("o" override / "v" vanished / "d" recent removed — all bounded by
  * `compactBound`); idempotent per-batchId overwrites, recovery takes
  * the newest snapshot and the newest epochs ≤ it (torn-compaction
  * orphans are ignored and redone by the replay), and a replayed fold
  * at or below the recovered snapshot is SKIPPED
  * ([[EpochSnapshots.alreadyApplied]] — pair `persistDir` with the
  * same stream `checkpoint` for the stream's lifetime).
  * IndexMaintPersistRestartSpec pins the crash-and-recover paths,
  * forced replay included. */
object StreamingIndexMaint {

  /** Run `opStream` (column `op` STRING 'add'|'rm' + the payload
    * columns `mkMembers` needs; 'rm' rows are read only at `docCol`)
    * to completion under AvailableNow against the standing
    * `initialIndex` and its member rows `histMembers`
    * (keyCol, docCol, orderCols…); returns the final index. `orderCols`
    * must contain `docCol` (the keeper tuple identifies a member);
    * add batches must carry doc ids not already present. */
  def maintain(opStream: DataFrame, initialIndex: DataFrame,
      histMembers: DataFrame, checkpoint: String, keyCol: String,
      docCol: String, orderCols: Seq[String],
      mkMembers: DataFrame => DataFrame, compactBound: Int = 10000,
      persistDir: Option[String] = None): DataFrame =
    maintainState(opStream, initialIndex, histMembers, checkpoint,
      keyCol, docCol, orderCols, mkMembers, compactBound, persistDir)
      .read

  /** [[maintain]] returning the live state carrier — the spec hook for
    * the O(1)-frames member-layer bound. */
  private[streaming] def maintainState(opStream: DataFrame,
      initialIndex: DataFrame, histMembers: DataFrame, checkpoint: String,
      keyCol: String, docCol: String, orderCols: Seq[String],
      mkMembers: DataFrame => DataFrame, compactBound: Int,
      persistDir: Option[String]): IndexState = {
    require(orderCols.contains(docCol),
      s"orderCols $orderCols must contain docCol $docCol — the keeper " +
        "tuple must identify the member it elects")
    val spark = opStream.sparkSession
    val recovered = persistDir.flatMap(d =>
      loadPersisted(spark, d, keyCol, docCol, orderCols))
    val state = new IndexState(spark,
      recovered.map(_.base).getOrElse(initialIndex), histMembers,
      keyCol, docCol, orderCols, compactBound, persistDir, recovered)
    if (recovered.isEmpty)
      persistDir.foreach(d => state.persistBase(d, -1L))
    EpochSnapshots.runAvailableNow(opStream, checkpoint)(
      state.fold(_, _, mkMembers))
    state
  }

  private[streaming] final case class Recovered(through: Long,
      base: DataFrame, members: Option[DataFrame],
      removed: Option[DataFrame], added: Seq[DataFrame],
      overrideRows: Seq[Row], vanished: Seq[Any], removedRecent: Seq[Any])

  private[streaming] def loadPersisted(spark: SparkSession, dir: String,
      keyCol: String, docCol: String, orderCols: Seq[String])
      : Option[Recovered] =
    EpochSnapshots.load(spark, dir, "StreamingIndexMaint",
      primarySub = "base", secondarySubs = Seq("members", "removed"),
      addedGateSub = "members").map { l =>
      val n = orderCols.size
      val ov = l.stateRows.filter(_.getString(0) == "o")
        .map(r => Row.fromSeq((1 to n + 2).map(r.get)))
      val vn = l.stateRows.filter(_.getString(0) == "v").map(_.get(1))
      // "d" rows carry the doc id in the docCol slot of the order cols
      val dPos = 2 + orderCols.indexOf(docCol)
      val dr = l.stateRows.filter(_.getString(0) == "d").map(_.get(dPos))
      Recovered(l.through, l.primary, l.secondary.get("members"),
        l.secondary.get("removed"), l.added, ov, vn, dr)
    }

  private[streaming] final class IndexState(spark: SparkSession,
      initialIndex: DataFrame, histMembers: DataFrame, keyCol: String,
      docCol: String, orderCols: Seq[String], compactBound: Int,
      persistDir: Option[String], recovered: Option[Recovered]) {

    private val keyType = initialIndex.schema(keyCol).dataType
    private val docType = histMembers.schema(docCol).dataType
    private val indexCols: Seq[String] =
      keyCol +: orderCols :+ "n_occ"
    private val memberCols: Seq[String] =
      (keyCol +: docCol +: orderCols).distinct
    private val overrideSchema = StructType(
      StructField(keyCol, keyType) +:
        orderCols.map(c =>
          StructField(c, histMembers.schema(c).dataType)) :+
        StructField("n_occ", initialIndex.schema("n_occ").dataType))
    private val recoveredThrough =
      recovered.map(_.through).getOrElse(Long.MinValue)

    // eager checkpoints: every recovered frame is materialized before
    // the stream starts (EpochSnapshots' contract)
    private var base = initialIndex
      .select(indexCols.map(col): _*).transform(Graphs.flatCheckpoint(_))
    // the override layer lives DRIVER-side in the shared ledger: the
    // re-elected rows are collected by the fold anyway (they are the
    // vanish bookkeeping too), so the pre-r19 per-fold localCheckpoint
    // that maintained a distributed copy — one whole execution per
    // fold — carried no information the driver didn't already hold.
    // Rows are bounded by compactBound, the same class as `vanished` /
    // `removedRecent` below; this maintainer never spills the ledger.
    private val overrides = new EpochSnapshots.OverrideLedger(spark,
      overrideSchema, recovered.map(_.overrideRows).getOrElse(Seq.empty))
    private val vanished = mutable.LinkedHashSet.empty[Any] ++
      recovered.map(_.vanished).getOrElse(Seq.empty)
    private val removedRecent = mutable.LinkedHashSet.empty[Any] ++
      recovered.map(_.removedRecent).getOrElse(Seq.empty)
    private val removedStanding =
      new EpochSnapshots.RemovedSlot(recovered.flatMap(_.removed))
    private val members = new EpochSnapshots.FrameLedger(
      recovered.flatMap(_.members)
        .getOrElse(histMembers.select(memberCols.map(col): _*)),
      initiallyOwned = false)
    recovered.map(_.added).getOrElse(Seq.empty).foreach(members.append)
    if (members.hasRecent) coalesceMembers()

    private[streaming] def memberFrameCount: Int =
      synchronized(members.frameCount)

    private def oneCol(vals: Seq[Any], name: String,
        t: org.apache.spark.sql.types.DataType): DataFrame =
      EpochSnapshots.localFrame(spark, vals.map(Row(_)),
        StructType(Seq(StructField(name, t))))

    /** All member rows of (history ∪ adds) ∖ removed. Folded removals
      * are already absent (the coalesce filters them); recent ones
      * anti-join via the driver set. */
    private def membersView: DataFrame = {
      val all = members.union
      if (removedRecent.isEmpty) all
      else all.join(
          broadcast(oneCol(removedRecent.toSeq, docCol, docType)),
          Seq(docCol), "left_anti")
        // using-joins move the join column FIRST — restore the member
        // order before anything unions this frame positionally
        .select(memberCols.map(col): _*)
    }

    /** The current index view: untouched base rows pass through
      * (one bounded broadcast anti-join), touched keys resolve to the
      * override; vanished keys appear on the touched side only. The
      * touched-key set is ONE exact-stats local relation (override keys
      * and vanished keys are disjoint by the fold's bookkeeping, so the
      * pre-r19 union + distinct — an exchange inside every view's
      * broadcast — carried nothing). */
    private def view: DataFrame = {
      val touchedKeys =
        oneCol((overrides.keys ++ vanished).toSeq, keyCol, keyType)
      val through = base.join(broadcast(touchedKeys),
        Seq(keyCol), "left_anti")
      overrides.frame match {
        case None => through
        case Some(o) => through.unionAll(o.select(indexCols.map(col): _*))
      }
    }

    /** Coalesce standing + recent member frames into ONE owned frame,
      * dropping rows of currently-tombstoned docs (they can never
      * re-enter: the no-resurrection filter is permanent). */
    private def coalesceMembers(): Unit =
      members.reset(EpochSnapshots.materializeStanding(membersView))

    /** Batch docs removed by a PAST compaction — visible only in the
      * standing removed-docs frame; one broadcast-semi probe, output
      * ≤ |batch| (the bounded-collect class). */
    private def foldedRemoved(docs: Seq[Any]): Set[Any] =
      removedStanding.get match {
        case None => Set.empty
        case Some(rs) =>
          if (docs.isEmpty) Set.empty
          else rs.join(broadcast(oneCol(docs, docCol, docType)),
              Seq(docCol), "left_semi")
            .select(col(docCol)).collect().map(_.get(0)).toSet
      }

    /** Re-elect keeper + n_occ over `ms` (member rows), one row per
      * digest present. Member rows are unique by their (orderCols…)
      * tuple by construction, so the distinct() is a no-op in normal
      * operation — defense-in-depth against duplicated member rows
      * (replayed batches, their original motivation, are skipped at
      * the fold gate since r18 — [[EpochSnapshots.alreadyApplied]]).
      * It runs on blast-radius-bounded sets only, never the corpus. */
    private def reelect(ms: DataFrame): DataFrame =
      ms.distinct().groupBy(col(keyCol))
        .agg(min(struct(orderCols.map(col): _*)).as("__kp"),
          count(lit(1)).as("n_occ"))
        .select(col(keyCol) +:
          orderCols.map(c => col("__kp").getField(c).as(c)) :+
          col("n_occ"): _*)

    def fold(batch: DataFrame, batchId: Long,
        mkMembers: DataFrame => DataFrame): Unit = synchronized {
      if (EpochSnapshots.alreadyApplied(recoveredThrough, batchId,
        "StreamingIndexMaint")) return
      // ONE gather-and-re-elect over addKeys ∪ rmAffKeys against the
      // members-after-ops view (r17 verdict next-round #2): the
      // pre-r18 fold ran the re-elect + override-merge chain once per
      // leg, and the two legs compose to exactly one re-elect over the
      // union — the fold invariant ("view = rebuild over history ∪
      // adds ∖ removed") doesn't care which leg touched a key.
      //
      // r19: the fold runs TWO executions, down from five — the probe
      // measured most of this family's wall as per-execution driver
      // overhead (planning + scheduling gaps), not task work:
      //   1. ONE tagged collect — the adds' derived member rows ("m")
      //      ride alongside the rm docs ("r", docCol slot) and the
      //      removals' affected keys ("k", keyCol slot; a member-view
      //      probe leg). mkMembers (the chunking stage) still runs
      //      exactly once and every leg is ∝ batch / its blast radius
      //      (the same bounded class the fold always collected);
      //   2. ONE gather-and-re-elect execution (below);
      // and the override merge became a driver-side ledger update
      // (zero jobs — the re-elect rows were already collected).
      val memberPlan = mkMembers(batch.where(col("op") === "add")
          .drop("op"))
        .select(memberCols.map(col): _*)
      val memberSchema = memberPlan.schema
      val nullOfM: String => Column =
        c => lit(null).cast(memberSchema(c).dataType)
      val rmDocsPlan = batch.where(col("op") === "rm")
        .select(col(docCol)).distinct()
      // the removals' affected keys must be read from the member view
      // while it still shows their rows — the PRE-removal view (the
      // recent-removals set grows only after this collect lands)
      val rmAffPlan = membersView
        .join(broadcast(rmDocsPlan), Seq(docCol), "left_semi")
        .select(col(keyCol)).distinct()
      val batchRows = memberPlan
        .select(lit("m").as("__kind") +: memberCols.map(col): _*)
        .unionAll(rmDocsPlan
          .select(lit("r").as("__kind") +: memberCols.map(c =>
            if (c == docCol) col(docCol) else nullOfM(c).as(c)): _*))
        .unionAll(rmAffPlan
          .select(lit("k").as("__kind") +: memberCols.map(c =>
            if (c == keyCol) col(keyCol) else nullOfM(c).as(c)): _*))
        .collect()
      val docIdx = memberCols.indexOf(docCol)
      val keyIdxM = memberCols.indexOf(keyCol)
      val removals: Seq[Any] = batchRows.iterator
        .filter(_.getString(0) == "r").map(_.get(1 + docIdx)).toSeq
      val rmAffKeys: Seq[Any] = batchRows.iterator
        .filter(_.getString(0) == "k").map(_.get(1 + keyIdxM)).toSeq
      val memberRows0 = batchRows.iterator
        .filter(_.getString(0) == "m")
        .map(r => Row.fromSeq(r.toSeq.tail)).toSeq
      val batchDocs = {
        val seen = mutable.LinkedHashMap.empty[Any, Any]
        for (r <- memberRows0)
          seen.getOrElseUpdate(Graphs.wrapKey(r.get(docIdx)),
            r.get(docIdx))
        seen.values.toSeq
      }
      // no resurrection — and removal wins a same-batch add+rm, so
      // THIS batch's removals count as dead too (the rebuild oracle's
      // set-minus semantics; pre-r18 the rm leg scrubbed them after
      // the fact)
      val removalSet = removals.map(Graphs.wrapKey).toSet
      val deadDocs: Set[Any] = batchDocs.filter(d =>
          removedRecent.contains(d) ||
            removalSet.contains(Graphs.wrapKey(d))).toSet ++
        foldedRemoved(batchDocs)
      val deadWrapped = deadDocs.map(Graphs.wrapKey)
      val memberRows = memberRows0.filterNot(r =>
        deadWrapped.contains(Graphs.wrapKey(r.get(docIdx))))
      val addMembers =
        EpochSnapshots.localFrame(spark, memberRows, memberSchema)
      val keyIdx = memberCols.indexOf(keyCol)
      val addKeys = {
        val seen = mutable.LinkedHashMap.empty[Any, Any]
        for (r <- memberRows)
          seen.getOrElseUpdate(Graphs.wrapKey(r.get(keyIdx)),
            r.get(keyIdx))
        seen.values.toSeq
      }
      removedRecent ++= removals
      // ---- one re-elect over every touched key -----------------------
      val affSet = (addKeys ++ rmAffKeys).distinct
      if (affSet.nonEmpty) {
        val affDf = broadcast(oneCol(affSet, keyCol, keyType))
        // membersView now excludes this batch's removals; the adds are
        // not yet appended, so the union IS the after-ops member set.
        // The re-elect result is ∝ |affSet| — collected once, it is
        // both the vanish bookkeeping and the fresh override rows (the
        // driver-side ledger merge costs no job).
        val gathered = membersView
          .join(affDf, Seq(keyCol), "left_semi")
          .unionAll(addMembers)
        val reRows = reelect(gathered).collect().toSeq
        val reelected = reRows.map(_.get(0)).toSet
        overrides.merge(reRows, affSet)
        // a re-elected key has ≥ 1 member after ops (vanished digests
        // with fresh adds legitimately live again); a touched key with
        // no row vanished (keeper gone, nothing retained)
        vanished --= reelected
        vanished ++= affSet.filterNot(reelected)
      }
      if (addKeys.nonEmpty) {
        persistDir.foreach(d => EpochSnapshots.persistEpoch(addMembers,
          d, "added", batchId, bounded = true))
        members.append(addMembers)
        if (members.overCap) coalesceMembers()
      }
      if (overrides.size + vanished.size + removedRecent.size >
          compactBound) compact(batchId)
      persistDir.foreach(d => persistSnapshot(d, batchId))
    }

    /** Fold override + vanished + recent removals into a new base —
      * the only index-sized rewrite; the member layer coalesces
      * (dropping removed docs' rows) and recent removals fold into the
      * standing removed-docs frame, so no layer grows with the
      * stream's lifetime (removed-docs grows with TOTAL takedown
      * volume — the permanent-takedown floor). */
    private def compact(batchId: Long): Unit = {
      val next = EpochSnapshots.materializeStanding(view)
      coalesceMembers() // while removedRecent is still populated
      if (removedRecent.nonEmpty)
        removedStanding.merge(oneCol(removedRecent.toSeq, docCol,
          docType))
      Graphs.freeLocalCheckpoint(base)
      base = next
      overrides.clear()
      vanished.clear()
      removedRecent.clear()
      persistDir.foreach { d =>
        persistBase(d, batchId)
        EpochSnapshots.persistEpoch(members.union, d, "members",
          batchId)
        removedStanding.write(d, "removed", batchId)
      }
    }

    def persistBase(dir: String, epoch: Long): Unit =
      EpochSnapshots.persistEpoch(base, dir, "base", epoch)

    /** One tagged frame per snapshot: "o" override rows (distributed),
      * "v" vanished keys, "d" recent removed docs (in the docCol slot);
      * all bounded by `compactBound`, overwrite = idempotent replay. */
    private def persistSnapshot(dir: String, batchId: Long): Unit = {
      val nullOf: String => Column =
        c => lit(null).cast(overrideSchema(c).dataType)
      val emptyOv =
        EpochSnapshots.localFrame(spark, Seq.empty, overrideSchema)
      val ovLeg = overrides.frame.getOrElse(emptyOv)
        .select(lit("o").as("kind") +: indexCols.map(col): _*)
      val vnLeg = oneCol(vanished.toSeq, keyCol, keyType)
        .select(lit("v").as("kind") +: col(keyCol) +:
          orderCols.map(nullOf) :+ nullOf("n_occ"): _*)
      val drLeg = oneCol(removedRecent.toSeq, docCol, docType)
        .select(lit("d").as("kind") +: nullOf(keyCol).cast(keyType)
            .as(keyCol) +:
          orderCols.map(c =>
            if (c == docCol) col(docCol) else nullOf(c)) :+
          nullOf("n_occ"): _*)
      EpochSnapshots.persistEpoch(
        ovLeg.unionAll(vnLeg).unionAll(drLeg), dir, "state", batchId,
        bounded = true)
    }

    def read: DataFrame = synchronized(view)
  }
}
