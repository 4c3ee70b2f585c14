package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.analytics.Graphs

/** The epoch-snapshot persistence core shared by the three mixed
  * maintainers ([[StreamingCcMixed]], [[StreamingIndexMaint]],
  * [[StreamingIvfMixed]]) — the r17 verdict's highest-leverage item:
  * the persist/recover/coalesce/replay invariants lived as three
  * near-copies, and every invariant fix was a three-site change (the
  * r16 eager-recovery lesson had to land in two places and then be
  * hand-applied to a third). This module holds each rule ONCE; the
  * maintainers keep only their payload semantics.
  *
  * The on-disk layout (per maintainer `persistDir`):
  *
  *   - `<primary>/<epoch>/`   — the corpus-sized base artifact, written
  *     at compactions (epoch −1 = the initial artifact, written once at
  *     fresh start; epoch N = the compaction done while folding batch N)
  *   - `<secondary>/<epoch>/` — per-layout standing side artifacts
  *     (members / edges / removed), also written only at compactions
  *   - `added/<batchId>/`     — one bounded frame per add batch (the
  *     DERIVED rows: assignment / chunking never re-runs on recovery)
  *   - `state/<batchId>/`     — ONE bounded tagged frame per fold,
  *     written LAST in every fold; its presence proves the fold's every
  *     other write landed
  *
  * Recovery ([[load]]) takes the newest `state` snapshot `m`, the
  * newest primary epoch ≤ m (a snapshot with NO eligible primary is an
  * incomplete dir — an explicit failure, not a fresh start), the newest
  * secondary epochs ≤ m, and the added frames in `(gateEpoch, m]` where
  * the gate is the layout's coalesce artifact (frames at or before a
  * persisted coalesce are already folded into it). Epochs > m are
  * torn-compaction orphans: ignored, and redone by the replay. Every
  * recovered frame is a LAZY parquet read — the state constructor
  * materializes each ([[Graphs.flatCheckpoint]]) before the stream
  * starts (the r16 advisor's crash-loop lesson; the three restart
  * suites pin it).
  *
  * Replay rule ([[alreadyApplied]]): `state/<batchId>` is the LAST
  * persist of a fold, so a recovered snapshot `m` proves every batch
  * ≤ m was fully applied AND persisted. A stream-checkpoint replay of
  * such a batch (crash after the state write, before the sink commit)
  * must therefore be SKIPPED — re-folding it would append rows the
  * recovery already holds (the r17 advisor's IvfMixed double-count).
  * The skip also makes it impossible for any fold to overwrite a path
  * recovery read from: new batches persist only under their own
  * batchId > m. Corollary of the rule: `persistDir` and the stream
  * `checkpoint` MUST pair for the stream's lifetime — a fresh
  * checkpoint over a recovered persistDir renumbers batches from 0 and
  * the skip would silently drop them (each maintainer documents the
  * contract; the skip logs a warning).
  */
private[streaming] object EpochSnapshots {

  /** Max recent per-batch payload frames held before they coalesce
    * into the ONE standing frame — bounds the member/edge/posting view
    * at FrameCap + O(1) union legs regardless of stream lifetime. The
    * coalesce is a standing-layer scan amortized over FrameCap batches;
    * 8 keeps plans shallow while coalescing ~once per 8 add batches. */
  val FrameCap = 8

  /** Numeric epoch subdirectories of `dir/sub` (absent dir = none). */
  def epochs(dir: String, sub: String): Seq[Long] = {
    val f = new java.io.File(s"$dir/$sub")
    if (!f.isDirectory) Seq.empty
    else f.listFiles().toSeq.filter(_.isDirectory)
      .flatMap(x => scala.util.Try(x.getName.toLong).toOption)
  }

  /** Everything recovery yields. All frames are LAZY parquet reads —
    * materialize before the stream starts. `through` = the newest
    * state snapshot: folds with batchId ≤ it are already applied. */
  final case class Loaded(through: Long, primaryEpoch: Long,
      primary: DataFrame, secondary: Map[String, DataFrame],
      added: Seq[DataFrame], stateRows: Seq[Row])

  /** The newest-snapshot ≤ rule. `owner` names the maintainer in the
    * incomplete-dir failure; `addedGateSub` is the secondary whose
    * newest epoch gates added-frame replay (frames ≤ it are folded into
    * the persisted coalesce artifact) — pass `primarySub` for layouts
    * whose primary IS the coalesce artifact. */
  def load(spark: SparkSession, dir: String, owner: String,
      primarySub: String, secondarySubs: Seq[String],
      addedGateSub: String): Option[Loaded] = {
    val snaps = epochs(dir, "state")
    if (snaps.isEmpty) None
    else {
      val m = snaps.max
      val eligible = epochs(dir, primarySub).filter(_ <= m)
      if (eligible.isEmpty)
        throw new IllegalStateException(
          s"$owner.loadPersisted: $dir holds state snapshot $m but " +
            s"no $primarySub epoch <= $m — the persist dir is " +
            s"incomplete (failed $primarySub/-1 write or partial " +
            s"copy); restore the $primarySub/ tree or clear the dir " +
            s"for a fresh start")
      val e = eligible.max
      val primary = spark.read.parquet(s"$dir/$primarySub/$e")
      val secondary = secondarySubs.flatMap { sub =>
        epochs(dir, sub).filter(_ <= m).sorted.lastOption
          .map(x => sub -> spark.read.parquet(s"$dir/$sub/$x"))
      }.toMap
      val gate =
        if (addedGateSub == primarySub) e
        else epochs(dir, addedGateSub).filter(_ <= m).sorted.lastOption
          .getOrElse(Long.MinValue)
      val added = epochs(dir, "added").filter(b => b <= m && b > gate)
        .sorted.map(b => spark.read.parquet(s"$dir/added/$b"))
      val stateRows = spark.read.parquet(s"$dir/state/$m")
        .collect().toSeq
      Some(Loaded(m, e, primary, secondary, added, stateRows))
    }
  }

  /** True when a replayed fold must be skipped: batchId ≤ the recovered
    * snapshot means the fold's every effect is already in the recovered
    * state (see the replay rule above). Logs — a skip on a correctly
    * paired checkpoint is a benign crash-replay, but a flood of skips
    * means a fresh checkpoint was pointed at an old persistDir. */
  def alreadyApplied(through: Long, batchId: Long, owner: String)
      : Boolean = {
    val skip = batchId <= through
    if (skip) org.slf4j.LoggerFactory.getLogger(owner).warn(
      s"$owner: skipping replayed batch $batchId (persisted state " +
        s"already covers batches <= $through). Benign after a crash; " +
        s"if this repeats for many batches, the stream checkpoint " +
        s"does not pair with the persistDir.")
    skip
  }

  /** Run `opStream` to completion under AvailableNow through `fold` —
    * the shared foreachBatch wiring. */
  def runAvailableNow(opStream: DataFrame, checkpoint: String)(
      fold: (DataFrame, Long) => Unit): Unit = {
    val q = opStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        fold(batch.toDF(), id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** A BOUNDED driver-built frame as ONE slice. A local relation
    * otherwise executes at up to defaultParallelism slices, so every
    * scan of a standing ∪ recent union grows +parallelism tasks per
    * appended batch (the r18 q217 fold profile: 32 → 160 tasks across
    * four folds, 70 s of task time for 4 s of stage wall — all task-
    * launch overhead on near-empty slices). These frames are batch- or
    * compactBound-sized (KBs) at any corpus scale, so one slice is the
    * right shape at 100 TB too; the narrow coalesce adds no job to
    * frames consumed by scans/joins. (Caveat, r18 advisor: a frame fed
    * ONLY to broadcast()/collect loses LocalTableScanExec's driver-side
    * no-job fast path — the CoalesceExec wrapper costs those sites a
    * 1-task job. Accepted: every call site either scans the frame in an
    * executor plan or tolerates the one bounded task, and one shape for
    * all sites beats auditing each consumer.) */
  def localFrame(spark: SparkSession, rows: Seq[Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1)

  /** Idempotent per-epoch artifact write. `bounded` frames (state
    * snapshots, per-batch adds) collapse to one file. */
  def persistEpoch(df: DataFrame, dir: String, sub: String, epoch: Long,
      bounded: Boolean = false): Unit =
    (if (bounded) df.coalesce(1) else df)
      .write.mode("overwrite").parquet(s"$dir/$sub/$epoch")

  /** Materialize a standing layer with a BOUNDED partition count.
    * Union concatenates its children's partitions, so a fold loop
    * that re-checkpoints `standing ∪ recent` grows the partition
    * count without bound — especially with local-relation recent
    * frames, which execute at up to defaultParallelism slices each;
    * by fold ~100 task-launch overhead made late folds 2.4× early
    * (the r18 index_maint_long probe). The narrow coalesce caps it at
    * the session default parallelism — no shuffle, no extra job. */
  def materializeStanding(df: DataFrame): DataFrame =
    Graphs.flatCheckpoint(
      df.coalesce(df.sparkSession.sparkContext.defaultParallelism))

  /** ONE standing frame + a capped list of recent per-batch frames —
    * the owned-frame ledger every maintainer's payload layer uses.
    * `owned` tracks whether the standing frame's checkpoint blocks are
    * ours to free on supersession (false for caller-provided history
    * and for lazy recovery reads). */
  final class FrameLedger(initial: DataFrame, initiallyOwned: Boolean) {
    private var standing = initial
    private var owned = initiallyOwned
    private val recent = mutable.ArrayBuffer.empty[DataFrame]

    def frameCount: Int = 1 + recent.size
    def overCap: Boolean = recent.size > FrameCap
    def hasRecent: Boolean = recent.nonEmpty
    /** standing ∪ recent, in append order. */
    def union: DataFrame = recent.foldLeft(standing)(_ unionAll _)
    def append(f: DataFrame): Unit = recent += f

    /** Supersede every frame with `next` (already materialized):
      * frees the owned standing blocks and every recent frame's. */
    def reset(next: DataFrame): Unit = {
      if (owned) Graphs.freeLocalCheckpoint(standing)
      recent.foreach(Graphs.freeLocalCheckpoint)
      recent.clear()
      standing = next
      owned = true
    }
  }

  /** The bounded repaired-rows OVERRIDE layer every mixed maintainer
    * composes over its base, keyed by the schema's FIRST column. The
    * common fold hands its repaired rows over DRIVER-side (they were
    * either collected anyway — the re-elect results — or solved by the
    * driver union-find), so the ledger holds them in a map: merge and
    * size cost ZERO jobs, and the view reads ONE exact-stats local
    * relation. The pre-r19 folds paid a localCheckpoint (and the CC
    * maintainers a count()) per fold just to keep a distributed copy of
    * rows the driver already had — the r18 probe attributed most of the
    * streaming family's wall to exactly these per-execution overheads.
    * A repair too large to collect (the giant-component fallback of
    * [[Graphs.ccRetractRepair]]) [[spill]]s the ledger one-way into a
    * checkpointed distributed frame until compaction [[clear]]s it —
    * the 100 TB path is unchanged, only the bounded path got cheap.
    * Also closes the r18 ADVICE invariant gap: the key set and the row
    * set live in ONE structure, so they cannot drift. */
  final class OverrideLedger(spark: SparkSession, schema: StructType,
      initRows: Seq[Row]) {
    private val keyName = schema.fields.head.name
    private val keySchema = StructType(Seq(schema.fields.head))
    private val local = mutable.LinkedHashMap.empty[Any, Row]
    initRows.foreach(r => local(Graphs.wrapKey(r.get(0))) = r)
    private var dist: Option[DataFrame] = None
    private var distSize = 0L

    def size: Long = if (dist.isDefined) distSize else local.size.toLong
    def spilled: Boolean = dist.isDefined
    /** Driver-held override keys (external values) — only meaningful
      * while not spilled. */
    def keys: Seq[Any] =
      if (dist.isDefined) throw new IllegalStateException(
        "OverrideLedger.keys on a spilled ledger")
      else local.values.iterator.map(_.get(0)).toSeq

    /** The override frame: an exact-stats local relation while
      * driver-held, the checkpointed frame after a spill; None when
      * empty. */
    def frame: Option[DataFrame] =
      dist.orElse(if (local.isEmpty) None
      else Some(localFrame(spark, local.values.toSeq, schema)))

    /** Supersede: drop the `drop` keys, insert the `fresh` rows (keyed
      * by their first column; fresh wins). Zero jobs while driver-held;
      * after a spill, one merge-checkpoint + count like the pre-ledger
      * distributed path. */
    def merge(fresh: Seq[Row], drop: Seq[Any]): Unit = dist match {
      case None =>
        drop.foreach(k => local.remove(Graphs.wrapKey(k)))
        fresh.foreach(r => local(Graphs.wrapKey(r.get(0))) = r)
      case Some(o) =>
        val gone = localFrame(spark,
          (drop ++ fresh.map(_.get(0))).map(Row(_)), keySchema)
        val next = materializeStanding(
          localFrame(spark, fresh, schema).unionAll(
            o.join(broadcast(gone), Seq(keyName), "left_anti")))
        distSize = next.count()
        Graphs.freeLocalCheckpoint(o)
        dist = Some(next)
    }

    /** One-way flip to a distributed frame: `resolved` (a plan —
      * checkpointed here) supersedes existing entries, `drop` keys
      * leave. Costs one checkpoint + count — exactly what EVERY fold
      * paid before the ledger existed. */
    def spill(resolved: DataFrame, drop: Seq[Any]): Unit = {
      val res = materializeStanding(resolved)
      val next = frame match {
        case None => res
        case Some(o) =>
          val merged = materializeStanding(res.unionAll(o
            .join(broadcast(res.select(col(keyName))),
              Seq(keyName), "left_anti")
            .join(broadcast(localFrame(spark, drop.map(Row(_)),
              keySchema)), Seq(keyName), "left_anti")))
          if (dist.isDefined) Graphs.freeLocalCheckpoint(o)
          Graphs.freeLocalCheckpoint(res)
          merged
      }
      distSize = next.count()
      local.clear()
      dist = Some(next)
    }

    /** Reset to empty (compaction folded the layer into the base). */
    def clear(): Unit = {
      dist.foreach(Graphs.freeLocalCheckpoint)
      dist = None
      distSize = 0L
      local.clear()
    }
  }

  /** The standing removed-ids slot shared by the takedown layouts: an
    * optional owned frame that recent removals fold into at compaction
    * (the permanent-takedown floor — sized by TOTAL takedown volume). */
  final class RemovedSlot(initial: Option[DataFrame]) {
    // eagerly materialized: recovery hands a lazy read
    private var cur: Option[DataFrame] =
      initial.map(Graphs.flatCheckpoint(_))
    private var owned = cur.nonEmpty

    def get: Option[DataFrame] = cur
    def write(dir: String, sub: String, epoch: Long): Unit =
      cur.foreach(persistEpoch(_, dir, sub, epoch))

    /** Fold `recent` (a bounded ids frame) into the standing frame. */
    def merge(recent: DataFrame): Unit = {
      val merged = cur match {
        case None => recent
        case Some(rs) => rs.unionAll(recent)
      }
      val mergedCp = Graphs.flatCheckpoint(merged)
      if (owned) cur.foreach(Graphs.freeLocalCheckpoint)
      cur = Some(mergedCp)
      owned = true
    }
  }
}
