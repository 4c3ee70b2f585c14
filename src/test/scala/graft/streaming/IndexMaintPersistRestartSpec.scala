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

  test("replayed ADD-ONLY compaction at the recovered removed epoch: " +
      "no overwrite-while-reading crash, and the recovered removed " +
      "frame still blocks resurrection") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_impr_r").toString
    // a completed compaction at epoch 0 whose stream commit never
    // landed: base/members/removed/state all at 0; the replay's first
    // batchId is 0 again, and (add-only + bound 0) it re-compacts AT 0.
    // Pre-fix, removedStanding stayed a lazy read of removed/0 and the
    // compaction's overwrite of that same path crash-looped recovery.
    Seq(("A", 2L, 1L)).toDF("k", "doc_id", "n_occ")
      .write.parquet(s"$dir/_state/base/0")
    Seq(("A", 2L)).toDF("k", "doc_id")
      .write.parquet(s"$dir/_state/members/0")
    Seq(1L).toDF("doc_id").write.parquet(s"$dir/_state/removed/0")
    Seq.empty[(String, Option[String], Option[Long], Option[Long])]
      .toDF("kind", "k", "doc_id", "n_occ")
      .write.parquet(s"$dir/_state/state/0")
    val histM = Seq((2L, "A")).toDF("doc_id", "text")
      .select(col("text").as("k"), col("doc_id"))
    val index = histM.groupBy(col("k"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
    Seq(("add", 10L, "A"), ("add", 1L, "A"))
      .toDF("op", "doc_id", "text").repartition(1)
      .write.mode("append").parquet(s"$dir/in")
    val out = StreamingIndexMaint.maintain(
        spark.readStream
          .schema("op STRING, doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
        index, histM, s"$dir/_ckpt", keyCol = "k", docCol = "doc_id",
        orderCols = Seq("doc_id"), mkMembers = mkMembers,
        compactBound = 0, persistDir = Some(s"$dir/_state"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 1 is tombstoned in the RECOVERED removed frame → dropped;
    // doc 10 joins A (keeper stays 2, n_occ 2)
    assert(out === Map("A" -> (2L, 2L)),
      "recovered removed frame lost on the add-only compaction replay")
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
