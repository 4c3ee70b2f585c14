package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Crash-and-recover for the streaming index maintainer: override,
  * vanished keys, removed docs, AND the added-member layer must survive
  * a DRIVER restart via `persistDir`. The restart run is handed a
  * deliberately WRONG `initialIndex` (every digest claiming keeper −1)
  * to prove recovery reads the persisted state; both compaction regimes
  * (bound 0 → recovered from compacted base/members/removed epochs;
  * default → from the tagged snapshot + per-batch added dirs). */
class IndexMaintPersistRestartSpec extends AnyFunSuite
    with SparkTestBase {

  private def mkMembers(df: DataFrame): DataFrame =
    df.select(col("text").as("k"), col("doc_id"))

  for ((regime, bound) <- Seq(("base-epoch", 0), ("snapshot", 10000)))
    test(s"[$regime] stop between batches, restart with wrong " +
        "initialIndex: keepers, vanishes, removals, and added members " +
        "all recovered") {
      import spark.implicits._
      val dir =
        java.nio.file.Files.createTempDirectory("graft_impr").toString
      // history: A = {1, 2}; B = {3}; C = {4}
      val hist = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      val histM = hist.toDF("doc_id", "text")
        .select(col("text").as("k"), col("doc_id"))
      val index = histM.groupBy(col("k"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))

      def run(ops: Seq[(String, Long, String)], idx: DataFrame)
          : Map[String, (Long, Long)] = {
        ops.toDF("op", "doc_id", "text").repartition(1)
          .write.mode("append").parquet(s"$dir/in")
        StreamingIndexMaint.maintain(
            spark.readStream
              .schema("op STRING, doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
            idx, histM, s"$dir/_ckpt", keyCol = "k", docCol = "doc_id",
            orderCols = Seq("doc_id"), mkMembers = mkMembers,
            compactBound = bound, persistDir = Some(s"$dir/_state"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      }

      // phase 1: rm 1 (A hands off to 2), rm 3 (B vanishes),
      // add 10 to A (n_occ back to 2)
      val phase1 = run(Seq(("rm", 1L, ""), ("rm", 3L, ""),
        ("add", 10L, "A")), index)
      assert(phase1 === Map("A" -> (2L, 2L), "C" -> (4L, 1L)))

      // "crash": restart with an index claiming keeper −1 everywhere —
      // only the persisted state knows the handoff, the vanish, and
      // doc 10. Phase 2: rm 2 (A must hand off to the RECOVERED 10),
      // add 11 to B (vanished digest lives again), add 12 under
      // REMOVED doc 3's digest... no — re-add doc 3 itself: dropped
      // (no resurrection, the removal was persisted).
      val wrong = index.select(col("k"), lit(-1L).as("doc_id"),
        col("n_occ"))
      val phase2 = run(Seq(("rm", 2L, ""), ("add", 11L, "B"),
        ("add", 3L, "B")), wrong)
      assert(phase2 === Map("A" -> (10L, 1L), "B" -> (11L, 1L),
        "C" -> (4L, 1L)),
        "restart lost persisted index state, dropped the recovered " +
          "added member, or resurrected a removed doc")
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  test("torn compaction: base/members/removed epochs without their " +
      "snapshot are ignored; added frames reconstruct from their dirs") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_impr_t").toString
    Seq(("A", 1L, 2L), ("B", 3L, 1L)).toDF("k", "doc_id", "n_occ")
      .write.parquet(s"$dir/base/-1")
    // snapshot at batch 2: override A -> (2, 1), vanished B, recent rm 1
    Seq(("o", Option("A"), Option(2L), Option(1L)),
        ("v", Option("B"), Option.empty[Long], Option.empty[Long]),
        ("d", Option.empty[String], Option(1L), Option.empty[Long]))
      .toDF("kind", "k", "doc_id", "n_occ")
      .write.parquet(s"$dir/state/2")
    Seq(("D", 9L)).toDF("k", "doc_id").write.parquet(s"$dir/added/2")
    // torn compaction during batch 3
    Seq(("Z", 0L, 9L)).toDF("k", "doc_id", "n_occ")
      .write.parquet(s"$dir/base/3")
    Seq(("Z", 0L)).toDF("k", "doc_id").write.parquet(s"$dir/members/3")
    Seq(0L).toDF("doc_id").write.parquet(s"$dir/removed/3")
    Seq(("E", 8L)).toDF("k", "doc_id").write.parquet(s"$dir/added/3")
    val Some(rec) = StreamingIndexMaint.loadPersisted(spark, dir, "k",
      "doc_id", Seq("doc_id"))
    assert(rec.base.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet ===
      Set(("A", 1L, 2L), ("B", 3L, 1L)))
    assert(rec.members.isEmpty && rec.removed.isEmpty,
      "orphan members/removed epochs leaked into recovery")
    assert(rec.added.map(_.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq) === Seq(Seq(("D", 9L))))
    assert(rec.overrideRows.map(r =>
      (r.get(0), r.get(1), r.get(2))) === Seq(("A", 2L, 1L)))
    assert(rec.vanished === Seq("B"))
    assert(rec.removedRecent === Seq(1L))
  }

  test("forced replay of a COMPACTING fold: the replayed batch is " +
      "skipped (no double-count, no overwrite of the recovered epoch) " +
      "and the recovered removed frame still blocks resurrection") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_impr_r").toString
    val histM = Seq((1L, "A"), (2L, "A")).toDF("doc_id", "text")
      .select(col("text").as("k"), col("doc_id"))
    val index = histM.groupBy(col("k"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
    def run(idx: DataFrame): Map[String, (Long, Long)] =
      StreamingIndexMaint.maintain(
          spark.readStream
            .schema("op STRING, doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
          idx, histM, s"$dir/_ckpt", keyCol = "k", docCol = "doc_id",
          orderCols = Seq("doc_id"), mkMembers = mkMembers,
          compactBound = 0, persistDir = Some(s"$dir/_state"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch 0 = [(rm 1), (add 10 to A)] with bound 0 → a real
    // compaction at epoch 0: base/0 holds A re-elected over {2, 10}
    // (unlike the pre-r18 planted fixture, which omitted the batch's
    // adds), removed/0 = {1}, state/0 written last
    Seq(("rm", 1L, ""), ("add", 10L, "A"))
      .toDF("op", "doc_id", "text").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    assert(run(index) === Map("A" -> (2L, 2L)))
    // crash after the state write, before the sink commit
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/.0.crc"))
    // restart replays batch 0 (skipped — already in base/0), then
    // folds batch 1: re-add of REMOVED doc 1 must hit the recovered
    // standing removed frame and drop; doc 11 founds B
    Seq(("add", 1L, "A"), ("add", 11L, "B"))
      .toDF("op", "doc_id", "text").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val wrong = index.select(col("k"), lit(-1L).as("doc_id"),
      col("n_occ"))
    assert(run(wrong) === Map("A" -> (2L, 2L), "B" -> (11L, 1L)),
      "compacting-fold replay double-counted n_occ, lost the " +
        "recovered removed frame, or resurrected a removed doc")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("a persistDir with snapshots but NO eligible base epoch fails " +
      "with an explicit message") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_impr_b").toString
    Seq(("d", Option.empty[String], Option(1L), Option.empty[Long]))
      .toDF("kind", "k", "doc_id", "n_occ")
      .write.parquet(s"$dir/state/2")
    val ex = intercept[IllegalStateException] {
      StreamingIndexMaint.loadPersisted(spark, dir, "k", "doc_id",
        Seq("doc_id"))
    }
    assert(ex.getMessage.contains("no base epoch"))
  }
}
