package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.similarity.{Clustering, Similarity}

/** The online epoch swap (RetrainSpec's two paths, STREAMED): a
  * no-fire stream must reuse epoch 0 verbatim — same quantizer object,
  * postings row-equal to plain mixed maintenance; a fired stream must
  * swap at the fold boundary to a quantizer trained FROM SCRATCH on
  * the retained corpus at fire time, re-encode everything, keep
  * folding later batches under the successor, and NOT re-fire on the
  * same drift (the baseline reset); takedowns cross the epoch boundary
  * (no resurrection after a swap). Synthetic dim-2 vectors; q223 gates
  * the real corpus against DuckDB's from-scratch training replay. */
class StreamingIvfRetrainSpec extends AnyFunSuite with SparkTestBase {

  private val ex = Seq(0.9, 0.1)
  private val ey = Seq(0.1, 0.9)
  private val drift = Seq(9.0, 9.5) // far from both hist modes

  private def run(tag: String, hist: Seq[(Long, Seq[Double])],
      batches: Seq[Seq[(String, Long, Seq[Double])]])
      : (StreamingIvfRetrain.Served, Array[(Int, Array[Double])],
        Seq[(Long, Array[Long])]) = {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory(s"graft_ivfr_$tag").toString
    val histDf = hist.toDF("vec_id", "e")
    val cents0 = Similarity.trainCells(histDf, k = 2, iters = 2)
    val monitor = Clustering.lloydCentroids(histDf, vecCol = "e",
      k = 2, updates = 1)
    val initial = Similarity.assignCells(histDf, cents0)
      .select(col("vec_id"), col("cell"), col("e"))
    batches.foreach(b => b.toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in"))
    val served = StreamingIvfRetrain.maintain(
      spark.readStream
        .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
      initial, cents0, monitor, k = 2, iters = 2,
      checkpoint = s"$dir/_ckpt")
    (served, cents0, monitor)
  }

  /** Persistent runner against a shared dir: appends `ops` as one more
    * file and drains the stream with `persistDir` set. */
  private def runPersist(dir: String,
      initial: org.apache.spark.sql.DataFrame,
      cents0In: Array[(Int, Array[Double])],
      monitor: Seq[(Long, Array[Long])],
      ops: Seq[(String, Long, Seq[Double])])
      : StreamingIvfRetrain.Served = {
    import spark.implicits._
    if (ops.nonEmpty) ops.toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    StreamingIvfRetrain.maintain(
      spark.readStream
        .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
      initial, cents0In, monitor, k = 2, iters = 2,
      checkpoint = s"$dir/_ckpt", persistDir = Some(s"$dir/_state"))
  }

  private val wrongCents: Array[(Int, Array[Double])] =
    Array(0 -> Array(5.0, 5.0), 1 -> Array(-5.0, -5.0))

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Int, Seq[Double])] =
    df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2))).toSet

  test("no-fire stream: epoch stays 0, the quantizer is the SAME " +
      "object, and postings equal plain mixed maintenance verbatim") {
    import spark.implicits._
    val hist = Seq((1L, ex), (2L, ey), (3L, ex), (4L, ey))
    val batches = Seq(
      Seq(("add", 10L, ex), ("add", 11L, ey)),
      Seq(("rm", 3L, Seq.empty[Double]), ("add", 12L, ex)))
    val (served, cents0, _) = run("nf", hist, batches)
    assert(served.epoch === 0L)
    assert(served.cents eq cents0,
      "a quiet stream must keep serving the deployed quantizer object")
    val expected = Similarity.assignCells(
        (hist ++ Seq((10L, ex), (11L, ey), (12L, ex)))
          .filterNot(_._1 == 3L).toDF("vec_id", "e"), cents0)
      .select(col("vec_id"), col("cell"), col("e"))
    assert(rows(served.postings) === rows(expected))
  }

  test("fired stream: swap at the fold boundary — successor trained " +
      "from scratch on the retained corpus at fire time, everything " +
      "re-encoded, later folds assign under it, same drift does not " +
      "re-fire") {
    import spark.implicits._
    val hist = Seq((1L, ex), (2L, ey), (3L, ex), (4L, ey))
    val batches = Seq(
      Seq(("add", 20L, drift), ("add", 21L, drift)), // fires → swap
      Seq(("add", 22L, drift)))                      // post-swap fold
    val (served, cents0, _) = run("f", hist, batches)
    assert(served.epoch === 1L,
      "the planted drift must fire exactly once (baseline reset)")
    // the successor = from-scratch train over the corpus AT FIRE TIME
    val atFire = (hist ++ Seq((20L, drift), (21L, drift)))
      .toDF("vec_id", "e")
    val cents1 = Similarity.trainCells(atFire, k = 2, iters = 2)
    assert(served.cents.map(_._1).toSeq === cents1.map(_._1).toSeq &&
      served.cents.zip(cents1).forall { case ((_, a), (_, b)) =>
        a.toSeq == b.toSeq },
      "swapped quantizer must equal the cold-build trajectory")
    assert(!(served.cents eq cents0))
    // final table = EVERYTHING (including the post-swap fold's add)
    // encoded under the successor
    val expected = Similarity.assignCells(
        (hist ++ Seq((20L, drift), (21L, drift), (22L, drift)))
          .toDF("vec_id", "e"), cents1)
      .select(col("vec_id"), col("cell"), col("e"))
    assert(rows(served.postings) === rows(expected))
  }

  test("restart after a committed SWAP fold: quantizer, baseline, and " +
      "re-encoded postings recover (wrong cents0/initial ignored), " +
      "and the same drift does not re-fire on the next fold") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfr_p").toString
    val hist = Seq((1L, ex), (2L, ey), (3L, ex), (4L, ey))
    val histDf = hist.toDF("vec_id", "e")
    val cents0 = Similarity.trainCells(histDf, k = 2, iters = 2)
    val monitor = Clustering.lloydCentroids(histDf, vecCol = "e",
      k = 2, updates = 1)
    val initial = Similarity.assignCells(histDf, cents0)
      .select(col("vec_id"), col("cell"), col("e"))
    // phase 1: the drifted fold fires → swap commits (epoch 1)
    val p1 = runPersist(dir, initial, cents0, monitor,
      Seq(("add", 20L, drift), ("add", 21L, drift)))
    assert(p1.epoch === 1L)
    // "crash": restart with GARBAGE initial artifacts — only the
    // persisted quantizer/monitor/postings know the swap happened
    val wrongInit = initial.select(col("vec_id"), lit(-1).as("cell"),
      col("e"))
    val p2 = runPersist(dir, wrongInit, wrongCents, monitor,
      Seq(("add", 22L, drift)))
    assert(p2.epoch === 1L,
      "recovered post-swap baseline must keep the same drift from " +
        "re-firing (epoch 2 = baseline lost; epoch 0 = quantizer lost)")
    val atFire = (hist ++ Seq((20L, drift), (21L, drift)))
      .toDF("vec_id", "e")
    val cents1 = Similarity.trainCells(atFire, k = 2, iters = 2)
    val expected = Similarity.assignCells(
        (hist ++ Seq((20L, drift), (21L, drift), (22L, drift)))
          .toDF("vec_id", "e"), cents1)
      .select(col("vec_id"), col("cell"), col("e"))
    assert(rows(p2.postings) === rows(expected),
      "restart lost the recovered epoch-1 quantizer or postings")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("forced replay of the SWAP fold: skipped (state-last covers " +
      "the hook's persists), epoch stays 1, no double-retrain") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfr_rp").toString
    val hist = Seq((1L, ex), (2L, ey), (3L, ex), (4L, ey))
    val histDf = hist.toDF("vec_id", "e")
    val cents0 = Similarity.trainCells(histDf, k = 2, iters = 2)
    val monitor = Clustering.lloydCentroids(histDf, vecCol = "e",
      k = 2, updates = 1)
    val initial = Similarity.assignCells(histDf, cents0)
      .select(col("vec_id"), col("cell"), col("e"))
    val p1 = runPersist(dir, initial, cents0, monitor,
      Seq(("add", 20L, drift), ("add", 21L, drift)))
    assert(p1.epoch === 1L)
    // crash AFTER the fold's state write but BEFORE the sink commit:
    // the restart replays the swap fold — which must be SKIPPED, its
    // effects coming entirely from the recovered epoch
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/.0.crc"))
    val p2 = runPersist(dir, initial, wrongCents, monitor,
      Seq(("add", 22L, drift)))
    assert(p2.epoch === 1L,
      "replayed swap fold must not retrain again")
    val atFire = (hist ++ Seq((20L, drift), (21L, drift)))
      .toDF("vec_id", "e")
    val cents1 = Similarity.trainCells(atFire, k = 2, iters = 2)
    val expected = Similarity.assignCells(
        (hist ++ Seq((20L, drift), (21L, drift), (22L, drift)))
          .toDF("vec_id", "e"), cents1)
      .select(col("vec_id"), col("cell"), col("e"))
    assert(rows(p2.postings) === rows(expected),
      "replayed swap fold duplicated adds or lost the epoch-1 state")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("no resurrection across the swap: a takedown from epoch 0 " +
      "still blocks the re-add in epoch 1") {
    import spark.implicits._
    val hist = Seq((1L, ex), (2L, ey), (3L, ex), (4L, ey))
    val batches = Seq(
      Seq(("rm", 1L, Seq.empty[Double])),            // epoch-0 takedown
      Seq(("add", 20L, drift), ("add", 21L, drift)), // fires → swap
      Seq(("add", 1L, ex)))                          // re-add: dropped
    val (served, _, _) = run("nr", hist, batches)
    assert(served.epoch === 1L)
    val atFire = (hist.filterNot(_._1 == 1L) ++
      Seq((20L, drift), (21L, drift))).toDF("vec_id", "e")
    val cents1 = Similarity.trainCells(atFire, k = 2, iters = 2)
    val expected = Similarity.assignCells(atFire, cents1)
      .select(col("vec_id"), col("cell"), col("e"))
    assert(rows(served.postings) === rows(expected),
      "removed id resurrected across the epoch swap, or the retrain " +
        "trained on a non-retained corpus")
  }
}
