package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

import graft.similarity.{Retrain, Similarity}

/** ONLINE drift-triggered epoch swap — q222's retrain consumer wired
  * INTO the mixed streaming maintenance loop (the r17 verdict's
  * next-round #3: the batch consumer existed, but a production serving
  * loop retrains WHILE maintaining). One stream of vector adds and
  * takedown removes folds into the standing posting table under the
  * CURRENT frozen quantizer ([[StreamingIvfMixed]]'s machinery,
  * unchanged); a k-row integer drift monitor watches what each fold
  * actually ADDS; when the q203 predicate fires, the swap runs at the
  * fold boundary:
  *
  *   - the successor quantizer trains FROM SCRATCH over the retained
  *     corpus ([[Similarity.trainCells]] — the same trajectory a cold
  *     build walks, so the swapped index is indistinguishable from one
  *     trained fresh; q223 gates exactly that),
  *   - every retained vector re-encodes under it
  *     ([[StreamingIvfMixed.IvfState.reencode]] — which also folds the
  *     removal layers compaction-style, so NO-RESURRECTION crosses the
  *     epoch boundary: a takedown from epoch N still blocks a re-add
  *     in epoch N+1, spec-pinned),
  *   - the epoch counter advances and SUBSEQUENT folds assign under
  *     the new quantizer. Until the swap completes, every read —
  *     including the fold that triggered it — serves the OLD epoch;
  *     the foreachBatch callback is the commit point, so no query ever
  *     sees half-trained state (RetrainSpec's single-reference rule,
  *     streamed).
  *
  * Monitor bookkeeping is ≤ k integer rows per fold
  * ([[Retrain.monitorStats]] of the fold's RETAINED adds — a
  * fully-dropped add batch must not fire): on no-fire the delta frame
  * FOLDS INTO the baseline (those vectors are history for every later
  * fold), on fire the baseline resets to the new epoch's corpus — so
  * the same drift does not re-fire every subsequent fold against a
  * stale baseline. Removals don't decrement the baseline (the monitor
  * is a drift instrument, not an exact census; the fire predicate
  * itself stays integer-exact on whatever frames it is handed).
  *
  * `persistDir` (optional) makes the WHOLE serving loop crash-safe —
  * posting layers via the shared [[EpochSnapshots]] scheme (unchanged)
  * plus two wrapper artifacts, both written inside the fold's
  * `beforeCommit` hook so the state-last replay rule covers them
  * (`state/<batchId>` present ⟹ the swap's every persist landed; a
  * torn swap leaves only orphan epochs that recovery ignores and the
  * replayed fold redoes):
  *
  *   - `quantizer/<batchId>` — the frozen centroids, written at fresh
  *     start (−1) and at each swap; recovery takes the newest ≤ the
  *     snapshot and the epoch counter = eligible dirs − 1;
  *   - `monitor/<batchId>` — the ≤ k-row integer baseline after every
  *     fold; recovery takes the newest ≤ the snapshot, so the baseline
  *     a restart resumes with is exactly the one the crashed run held,
  *     and fire decisions are replay-deterministic.
  *
  * StreamingIvfRetrainSpec pins the fire-at-fold-boundary path, the
  * no-fire stream reusing epoch 0 verbatim, no-resurrection across
  * the swap, and the crash/replay paths (restart with wrong
  * initial artifacts, forced replay of the swap fold); q223 gates the
  * streamed fire path against DuckDB's from-scratch training replay. */
object StreamingIvfRetrain {

  /** The serving artifacts after the stream drains: the retained
    * posting table, the quantizer it is encoded under, and how many
    * swaps have EVER fired on this persistDir (epoch 0 = never). */
  final case class Served(postings: DataFrame,
      cents: Array[(Int, Array[Double])], epoch: Long)

  private val quantizerSchema = StructType(Seq(
    StructField("cell", org.apache.spark.sql.types.IntegerType),
    StructField("c", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))))
  private val monitorSchema = StructType(Seq(
    StructField("cluster", org.apache.spark.sql.types.LongType),
    StructField("n", org.apache.spark.sql.types.LongType),
    StructField("dist2",
      org.apache.spark.sql.types.DecimalType(38, 0))))

  private def writeQuantizer(spark: SparkSession, dir: String,
      batchId: Long, cents: Array[(Int, Array[Double])]): Unit =
    EpochSnapshots.persistEpoch(
      EpochSnapshots.localFrame(spark,
        cents.toSeq.map { case (c, v) => Row(c, v.toSeq) },
        quantizerSchema),
      dir, "quantizer", batchId, bounded = true)

  private def readQuantizer(spark: SparkSession, path: String)
      : Array[(Int, Array[Double])] =
    spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  private def writeMonitor(spark: SparkSession, dir: String,
      batchId: Long, stats: Map[Long, (Long, BigInt)]): Unit =
    EpochSnapshots.persistEpoch(
      EpochSnapshots.localFrame(spark,
        stats.toSeq.map { case (c, (n, d)) =>
          Row(c, n, new java.math.BigDecimal(d.bigInteger)) },
        monitorSchema),
      dir, "monitor", batchId, bounded = true)

  private def readMonitor(spark: SparkSession, path: String)
      : Map[Long, (Long, BigInt)] =
    spark.read.parquet(path).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
      .toMap

  /** Run `opStream` (op 'add'|'rm' + idCol + `e` ARRAY<DOUBLE>) to
    * completion under AvailableNow against `initialPostings`
    * (idCol, cell, e) encoded under `cents0`, with drift-triggered
    * retraining. `monitor` is the frozen integer drift instrument
    * (its baseline starts from the standing corpus); `k`/`iters` are
    * the successor quantizer's training knobs. When `persistDir`
    * holds a recoverable state, `initialPostings` and `cents0` are
    * IGNORED (pair it with the same `checkpoint` for the stream's
    * lifetime — the maintainer contract). */
  def maintain(opStream: DataFrame, initialPostings: DataFrame,
      cents0: Array[(Int, Array[Double])],
      monitor: Seq[(Long, Array[Long])], k: Int, iters: Int,
      checkpoint: String, idCol: String = "vec_id",
      compactBound: Int = 10000,
      persistDir: Option[String] = None,
      trainSampleFraction: Double = 1.0): Served = {
    val spark = opStream.sparkSession
    val recovered =
      persistDir.flatMap(d => StreamingIvfMixed.loadPersisted(spark, d))
    val state = new StreamingIvfMixed.IvfState(spark,
      recovered.map(_.postings).getOrElse(initialPostings), idCol,
      compactBound, persistDir, recovered)
    if (recovered.isEmpty)
      persistDir.foreach(d => state.persistPostings(d, -1L))
    val through = recovered.map(_.through).getOrElse(Long.MinValue)
    // quantizer epochs ≤ the recovered snapshot: newest = the serving
    // quantizer, count − 1 = how many swaps have ever committed
    var cents = cents0
    var epoch = 0L
    persistDir.foreach { d =>
      val eligible = EpochSnapshots.epochs(d, "quantizer")
        .filter(_ <= through).sorted
      eligible.lastOption match {
        case Some(q) =>
          cents = readQuantizer(spark, s"$d/quantizer/$q")
          epoch = eligible.size - 1L
        case None => writeQuantizer(spark, d, -1L, cents0)
      }
    }
    // the baseline: newest persisted monitor frame ≤ the snapshot
    // (exactly what the crashed run held — fire decisions replay
    // deterministically); fresh start = the standing corpus's frame
    var baseline = persistDir
      .flatMap { d =>
        EpochSnapshots.epochs(d, "monitor").filter(_ <= through)
          .sorted.lastOption
          .map(m => readMonitor(spark, s"$d/monitor/$m"))
      }
      .getOrElse(Retrain.monitorStats(
        recovered.map(_.postings).getOrElse(initialPostings), monitor,
        idCol, "e"))
    // closes over `cents`: after a swap, later folds assign under the
    // successor quantizer with no re-wiring
    def mk(df: DataFrame): DataFrame =
      Similarity.assignCells(df, cents, idCol, "e")
        .select(col(idCol), col("cell"), col("e"))
    EpochSnapshots.runAvailableNow(opStream, checkpoint) { (batch, id) =>
      state.fold(batch, id, mk, beforeCommit = added => {
        added.foreach { a =>
          val delta = Retrain.monitorStats(a, monitor, idCol, "e")
          if (Retrain.fires(baseline, delta)) {
            // fold-boundary swap: train from scratch on the retained
            // corpus, re-encode, advance, reset the baseline to the
            // new epoch's corpus
            // trainSampleFraction < 1 is the 100 TB path: the swap's
            // from-scratch training runs on trainCells' deterministic
            // id-stable sample while the re-encode still assigns the
            // FULL retained corpus (the same split q92's trained IVF
            // uses; AnnQualitySpec bounds sample-trained recall)
            cents = Similarity.trainCells(
              state.read.select(col(idCol), col("e")), k, iters, idCol,
              "e", sampleFraction = trainSampleFraction)
            state.reencode(mk, id)
            epoch += 1
            persistDir.foreach(d => writeQuantizer(spark, d, id, cents))
            baseline = Retrain.monitorStats(state.read, monitor, idCol,
              "e")
          } else baseline = Retrain.mergeStats(baseline, delta)
        }
        persistDir.foreach(d => writeMonitor(spark, d, id, baseline))
      })
      ()
    }
    Served(state.read, cents, epoch)
  }
}
