package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.similarity.Similarity

/** Crash-and-recover for the streaming IVF maintainer: the added
  * posting layer, the standing removed frame, and the recent-removals
  * set must survive a DRIVER restart via `persistDir`. The restart run
  * is handed a deliberately WRONG `initialPostings` (every vector
  * claiming cell −1) to prove recovery reads the persisted state; both
  * compaction regimes run. Plus the torn-compaction and no-eligible-
  * postings edges, and the replayed add-only compaction at the
  * recovered removed epoch (the r16 advisor's StreamingIndexMaint
  * crash-loop shape, guarded here from birth). */
class IvfMixedPersistRestartSpec extends AnyFunSuite with SparkTestBase {

  private val cents: Array[(Int, Array[Double])] =
    Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
  private val ex = Seq(0.9, 0.1)
  private val ey = Seq(0.1, 0.9)

  private def mkPostings(df: DataFrame): DataFrame =
    Similarity.assignCells(df, cents).select(col("vec_id"),
      col("cell"), col("e"))

  for ((regime, bound) <- Seq(("postings-epoch", 0), ("snapshot", 10000)))
    test(s"[$regime] stop between batches, restart with wrong " +
        "initialPostings: adds, removals, and no-resurrection all " +
        "recovered") {
      import spark.implicits._
      val dir =
        java.nio.file.Files.createTempDirectory("graft_ivfp").toString
      val hist = Seq((1L, ex), (2L, ey))
      val initial = Similarity
        .assignCells(hist.toDF("vec_id", "e"), cents)
        .select(col("vec_id"), col("cell"), col("e"))

      def run(ops: Seq[(String, Long, Seq[Double])], init: DataFrame)
          : Map[Long, Int] = {
        ops.toDF("op", "vec_id", "e").repartition(1)
          .write.mode("append").parquet(s"$dir/in")
        StreamingIvfMixed.maintain(
            spark.readStream
              .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
              .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
            init, s"$dir/_ckpt", idCol = "vec_id",
            mkPostings = mkPostings, compactBound = bound,
            persistDir = Some(s"$dir/_state"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      }

      // phase 1: rm 1, add 10 (cell 1)
      val phase1 = run(Seq(("rm", 1L, Seq.empty[Double]),
        ("add", 10L, ey)), initial)
      assert(phase1 === Map(2L -> 1, 10L -> 1))

      // "crash": restart with postings claiming cell −1 everywhere —
      // only the persisted state knows the removal and doc 10.
      // Phase 2: rm 2, add 11 (cell 0), re-add REMOVED id 1 → dropped.
      val wrong = initial.select(col("vec_id"), lit(-1).as("cell"),
        col("e"))
      val phase2 = run(Seq(("rm", 2L, Seq.empty[Double]),
        ("add", 11L, ex), ("add", 1L, ex)), wrong)
      assert(phase2 === Map(10L -> 1, 11L -> 0),
        "restart lost persisted postings, the recovered add, or " +
          "resurrected a removed id")
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  test("forced replay of a COMPACTING fold: the replayed batch is " +
      "skipped (no overwrite of the recovered epoch) and the recovered " +
      "removed frame still blocks resurrection") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfp_r").toString
    val initial = Similarity
      .assignCells(Seq((1L, ex), (2L, ey)).toDF("vec_id", "e"), cents)
      .select(col("vec_id"), col("cell"), col("e"))
    def run(init: DataFrame): Seq[(Long, Int)] =
      StreamingIvfMixed.maintain(
          spark.readStream
            .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
          init, s"$dir/_ckpt", idCol = "vec_id",
          mkPostings = mkPostings, compactBound = 0,
          persistDir = Some(s"$dir/_state"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    // batch 0 = [(rm 1), (add 10)] with bound 0 → a real compaction at
    // epoch 0: postings/0 holds the batch's adds (unlike the pre-r18
    // planted fixture), removed/0 = {1}, state/0 written last
    Seq(("rm", 1L, Seq.empty[Double]), ("add", 10L, ey))
      .toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    assert(run(initial) === Seq(2L -> 1, 10L -> 1))
    // crash after the state write, before the sink commit
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/.0.crc"))
    // the restart replays batch 0 (skipped — already in postings/0),
    // then folds batch 1: re-add of REMOVED id 1 must hit the
    // recovered standing removed frame and drop
    Seq(("add", 1L, ex), ("add", 11L, ex))
      .toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val out = run(initial.select(col("vec_id"), lit(-1).as("cell"),
      col("e")))
    assert(out === Seq(2L -> 1, 10L -> 1, 11L -> 0),
      "compacting-fold replay duplicated rows, lost the recovered " +
        "removed frame, or resurrected a removed id")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("forced replay of a persisted-but-uncommitted batch (deleted " +
      "stream commit) does not double-count its adds") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfp_d").toString
    val initial = Similarity
      .assignCells(Seq((1L, ex)).toDF("vec_id", "e"), cents)
      .select(col("vec_id"), col("cell"), col("e"))
    def run(init: DataFrame): Seq[(Long, Int)] =
      StreamingIvfMixed.maintain(
          spark.readStream
            .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
          init, s"$dir/_ckpt", idCol = "vec_id",
          mkPostings = mkPostings, compactBound = 10000,
          persistDir = Some(s"$dir/_state"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    // phase 1: one committed batch [(add 10)] — non-compacting, so
    // added/0 survives into recovery
    Seq(("add", 10L, ey)).toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    assert(run(initial) === Seq(1L -> 0, 10L -> 1))
    // crash AFTER the fold persisted state/0 but BEFORE the stream
    // commit landed: delete commits/0, so the restart replays batch 0
    // against a recovery that already holds added/0
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/0"))
    // and Hadoop's checksum sibling — a stale .crc fails the rewrite
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/.0.crc"))
    Seq(("add", 11L, ex)).toDF("op", "vec_id", "e").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val out = run(initial.select(col("vec_id"), lit(-1).as("cell"),
      col("e")))
    assert(out === Seq(1L -> 0, 10L -> 1, 11L -> 0),
      "replayed batch 0 duplicated its recovered add rows")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("torn compaction: postings/removed epochs without their " +
      "snapshot are ignored; added frames reconstruct from their dirs") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfp_t").toString
    Seq((1L, 0, ex)).toDF("vec_id", "cell", "e")
      .write.parquet(s"$dir/postings/-1")
    Seq(5L).toDF("vec_id").write.parquet(s"$dir/state/2")
    Seq((9L, 1, ey)).toDF("vec_id", "cell", "e")
      .write.parquet(s"$dir/added/2")
    // torn compaction during batch 3
    Seq((0L, 0, ex)).toDF("vec_id", "cell", "e")
      .write.parquet(s"$dir/postings/3")
    Seq(0L).toDF("vec_id").write.parquet(s"$dir/removed/3")
    Seq((8L, 0, ex)).toDF("vec_id", "cell", "e")
      .write.parquet(s"$dir/added/3")
    val Some(rec) = StreamingIvfMixed.loadPersisted(spark, dir)
    assert(rec.postings.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(rec.removed.isEmpty,
      "orphan removed epoch leaked into recovery")
    assert(rec.added.map(_.collect().map(_.getLong(0)).toSeq) ===
      Seq(Seq(9L)))
    assert(rec.removedRecent === Seq(5L))
  }

  test("a persistDir with snapshots but NO eligible postings epoch " +
      "fails with an explicit message") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ivfp_b").toString
    Seq(5L).toDF("vec_id").write.parquet(s"$dir/state/2")
    val ex2 = intercept[IllegalStateException] {
      StreamingIvfMixed.loadPersisted(spark, dir)
    }
    assert(ex2.getMessage.contains("no postings epoch"))
  }
}
