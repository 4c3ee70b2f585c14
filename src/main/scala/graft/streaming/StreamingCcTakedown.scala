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
  *     corpus — held in the shared [[EpochSnapshots.OverrideLedger]]
  *     (driver-side while repairs stay in the union-find bound, zero
  *     jobs to merge; spilled to a checkpointed frame for a giant
  *     blast radius); a member repaired again is superseded, a member
  *     removed later is dropped;
  *   - COMPACTION: when the override passes `compactBound`, it and the
  *     tombstones fold into a new base (the only corpus-sized rewrite),
  *     and both reset.
  *
  * Reads go through (base ∖ tomb) ⟕ override — exact at any point. */
object StreamingCcTakedown {

  /** Run `removalStream` (one id column named `idCol`) to completion
    * under AvailableNow, repairing `initialLabels` per batch against the
    * static `pairs` edge set; returns the final retained
    * (idCol, cluster_id) map.
    *
    * `persistDir` (optional) makes the state survive a driver crash,
    * [[StreamingCcDelta]]'s scheme transposed: `base/<epoch>/` parquet
    * (epoch −1 = initial labels, epoch N = the compaction done while
    * folding batch N) and `state/<batchId>/` parquet — ONE frame per
    * snapshot holding the full override AND tombstone sets as tagged
    * rows (both are bounded: override by `compactBound`, tombstones by
    * the takedown volume since last compaction), so a snapshot is one
    * atomic-enough overwrite. Replayed batches are idempotent (removing
    * an already-tombstoned id resolves to an empty repair and rewrites
    * an identical snapshot); recovery takes the newest snapshot M and
    * the newest base epoch ≤ M — a crash between compaction write and
    * snapshot write leaves an orphan base that is ignored and redone.
    * If `persistDir` already holds a recoverable state, it is resumed
    * and `initialLabels` is IGNORED (pair with the same `checkpoint`).
    * TakedownPersistRestartSpec pins the crash-and-recover path. */
  def maintain(removalStream: DataFrame, initialLabels: DataFrame,
      pairs: DataFrame, checkpoint: String, idCol: String = "doc_id",
      compactBound: Int = 100000,
      persistDir: Option[String] = None): DataFrame = {
    val spark = removalStream.sparkSession
    val recovered = persistDir.flatMap(d => loadPersisted(spark, d))
    val state = new TakedownState(spark,
      recovered.map(_._1).getOrElse(initialLabels), pairs, idCol,
      compactBound, persistDir,
      recovered.map(_._2).getOrElse(Seq.empty),
      recovered.map(_._3).getOrElse(Seq.empty))
    if (recovered.isEmpty)
      persistDir.foreach(d => state.persistBase(d, -1L))
    val q = removalStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        state.fold(batch.toDF(), id))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    state.read
  }

  /** Recover (base, override rows, tombstones) from a [[maintain]]
    * `persistDir`; None when no snapshot has ever landed. */
  private[streaming] def loadPersisted(spark: SparkSession, dir: String)
      : Option[(DataFrame, Seq[Row], Seq[Any])] = {
    def epochs(sub: String): Seq[Long] = {
      val f = new java.io.File(s"$dir/$sub")
      if (!f.isDirectory) Seq.empty
      else f.listFiles().toSeq.filter(_.isDirectory)
        .flatMap(x => scala.util.Try(x.getName.toLong).toOption)
    }
    val snaps = epochs("state")
    if (snaps.isEmpty) None
    else {
      val m = snaps.max
      val eligible = epochs("base").filter(_ <= m)
      // same guard as StreamingCcDelta.loadPersisted: a snapshot with no
      // eligible base is an incomplete persist dir, not a fresh start
      if (eligible.isEmpty)
        throw new IllegalStateException(
          s"StreamingCcTakedown.loadPersisted: $dir holds state " +
            s"snapshot $m but no base epoch <= $m — the persist dir is " +
            s"incomplete (failed base/-1 write or partial copy); " +
            s"restore the base/ tree or clear the dir for a fresh start")
      val e = eligible.max
      val base = spark.read.parquet(s"$dir/base/$e")
      val rows = spark.read.parquet(s"$dir/state/$m").collect().toSeq
      val (ov, tb) = rows.partition(_.getString(0) == "o")
      Some((base, ov.map(r => Row(r.get(1), r.get(2))),
        tb.map(_.get(1))))
    }
  }

  private final class TakedownState(spark: SparkSession,
      initialLabels: DataFrame, pairs: DataFrame, idCol: String,
      compactBound: Int, persistDir: Option[String],
      initOverride: Seq[Row], initTomb: Seq[Any]) {

    private var base = initialLabels
      .select(col(idCol), col("cluster_id")).transform(Graphs.flatCheckpoint(_))
    private val tomb = mutable.LinkedHashSet.empty[Any] ++ initTomb
    // repaired labels live DRIVER-side in the shared ledger while every
    // repair stays inside the union-find bound (the common case — the
    // rows were solved driver-side anyway); a giant blast radius spills
    // it to a distributed frame. Pre-r19 every fold paid a
    // localCheckpoint + count() to maintain a distributed copy.
    private val overrides = {
      import org.apache.spark.sql.types.{StructField, StructType}
      new EpochSnapshots.OverrideLedger(spark,
        StructType(Seq(
          StructField(idCol, base.schema(idCol).dataType),
          StructField("cluster_id", base.schema("cluster_id").dataType))),
        initOverride)
    }

    private def tombDf: DataFrame = {
      import org.apache.spark.sql.types.{StructField, StructType}
      val schema = StructType(Seq(
        StructField(idCol, base.schema(idCol).dataType)))
      EpochSnapshots.localFrame(spark, tomb.toSeq.map(Row(_)), schema)
    }

    /** The current label view: (base ∖ tomb) ⟕ override. */
    private def view: DataFrame = {
      val retained =
        if (tomb.isEmpty) base
        else base.join(broadcast(tombDf), Seq(idCol), "left_anti")
      overrides.frame match {
        case None => retained
        case Some(o) => retained
          .join(broadcast(
              o.select(col(idCol), col("cluster_id").as("__ov"))),
            Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("__ov"), col("cluster_id")).as("cluster_id"))
      }
    }

    def fold(batch: DataFrame, batchId: Long): Unit = synchronized {
      // takedown batches are tiny by nature — the bounded-collect class;
      // the driver-side set is what lets the read anti-join broadcast
      val removals = batch.select(col(idCol)).distinct()
        .collect().map(_.get(0)).toSeq
      if (removals.isEmpty) return
      val remDf = {
        import org.apache.spark.sql.types.{StructField, StructType}
        val schema = StructType(Seq(
          StructField(idCol, base.schema(idCol).dataType)))
        EpochSnapshots.localFrame(spark, removals.map(Row(_)), schema)
      }
      // the driver-held removal values let the repair fuse its
      // affected/member probes into one execution; its resolved rows
      // come back driver-side in the bounded case and the ledger merge
      // costs no job (the new repair supersedes older overrides for
      // re-touched members; overrides for now-removed members drop —
      // they would be tomb-filtered anyway, dropping keeps the ledger
      // bounded)
      val repair = Graphs.ccRetractRepair(view, pairs, remDf, idCol,
        removedVals = Some(removals))
      repair.resolvedRows match {
        case Some(rows) => overrides.merge(rows, removals)
        case None => overrides.spill(repair.resolved, removals)
      }
      tomb ++= removals
      if (overrides.size > compactBound) compact(batchId)
      persistDir.foreach(d => persistSnapshot(d, batchId))
    }

    /** Fold tomb + override into a new base — the only corpus-sized
      * rewrite, amortized over `compactBound`-worth of repairs. */
    private def compact(batchId: Long): Unit = {
      val next = view.transform(Graphs.flatCheckpoint(_))
      Graphs.freeLocalCheckpoint(base)
      base = next
      overrides.clear()
      tomb.clear()
      persistDir.foreach(d => persistBase(d, batchId))
    }

    def persistBase(dir: String, epoch: Long): Unit =
      base.write.mode("overwrite").parquet(s"$dir/base/$epoch")

    /** One tagged frame per snapshot — the full override ("o" rows) and
      * tombstone ("t" rows) state after this fold; both bounded, so the
      * write is small, and overwrite makes replays idempotent. The
      * override leg stays DISTRIBUTED (a plan over its checkpointed
      * blocks — never collected); only the already-driver-side
      * tombstones are lifted into a frame. */
    private def persistSnapshot(dir: String, batchId: Long): Unit = {
      import org.apache.spark.sql.functions.lit
      import org.apache.spark.sql.types.{StructField, StructType}
      val c = base.schema("cluster_id").dataType
      val tbDf = {
        val schema = StructType(Seq(
          StructField(idCol, base.schema(idCol).dataType)))
        EpochSnapshots.localFrame(spark, tomb.toSeq.map(Row(_)), schema)
      }
      val empty = EpochSnapshots.localFrame(spark, Seq.empty,
        StructType(Seq(StructField(idCol, base.schema(idCol).dataType),
          StructField("cluster_id", c))))
      overrides.frame.getOrElse(empty)
        .select(lit("o").as("kind"), col(idCol), col("cluster_id"))
        .unionAll(tbDf.select(lit("t").as("kind"), col(idCol),
          lit(null).cast(c).as("cluster_id")))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/state/$batchId")
    }

    def read: DataFrame = synchronized(view)
  }
}
