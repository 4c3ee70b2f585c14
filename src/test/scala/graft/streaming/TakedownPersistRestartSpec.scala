package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Graphs

/** Crash-and-recover for the streaming takedown maintainer: override +
  * tombstone state must survive a DRIVER restart via `persistDir`, not
  * JVM memory. The restart run is handed deliberately WRONG
  * `initialLabels` (every node a singleton) to prove recovery reads the
  * persisted state; runs under both compaction regimes (bound 0 → state
  * recovered from a compacted BASE epoch; default bound → from the
  * tagged override+tombstone SNAPSHOT over the initial base). */
class TakedownPersistRestartSpec extends AnyFunSuite with SparkTestBase {

  for ((regime, bound) <- Seq(("base-epoch", 0), ("snapshot", 100000)))
    test(s"[$regime] stop between batches, restart with wrong " +
        "initialLabels: repairs and tombstones recovered") {
      import spark.implicits._
      val dir =
        java.nio.file.Files.createTempDirectory("graft_tdpr").toString
      val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L),
        (11L, 12L), (10L, 12L), (20L, 21L), (30L, 31L))
      val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 30L, 31L,
        40L).toDF("doc_id")
      val labels = Graphs.connectedComponents(ids, edges.toDF("a", "b"))
        .localCheckpoint()

      def run(removals: Seq[Long], lbl: org.apache.spark.sql.DataFrame)
          : Map[Long, Long] = {
        removals.toDF("doc_id").repartition(1)
          .write.mode("append").parquet(s"$dir/in")
        StreamingCcTakedown.maintain(
            spark.readStream.schema("doc_id BIGINT")
              .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
            lbl, edges.toDF("a", "b"), s"$dir/_ckpt",
            compactBound = bound, persistDir = Some(s"$dir/_state"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

      // phase 1: split the chain at 1, retire the triangle's canonical 10
      val phase1 = run(Seq(1L, 10L), labels)
      assert(phase1 === Map(0L -> 0L, 2L -> 2L, 3L -> 2L, 11L -> 11L,
        12L -> 11L, 20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L,
        40L -> 40L))

      // "crash": restart with singleton labels — only the persisted
      // state knows components, phase-1 repairs, and phase-1 tombstones
      val wrong = ids.select(col("doc_id"),
        col("doc_id").as("cluster_id"))
      val phase2 = run(Seq(2L, 20L, 21L), wrong)
      assert(phase2 === Map(0L -> 0L, 3L -> 3L, 11L -> 11L, 12L -> 11L,
        30L -> 30L, 31L -> 30L, 40L -> 40L),
        "restart lost persisted repairs/tombstones or resurrected a " +
          "removed node")
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  test("recovery ignores a base epoch whose snapshot never landed") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_tdpr_tail").toString
    Seq((0L, 0L), (1L, 0L), (2L, 2L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/base/-1")
    Seq(("o", 1L, Option(1L)), ("t", 0L, Option.empty[Long]))
      .toDF("kind", "doc_id", "cluster_id")
      .write.parquet(s"$dir/state/2")
    // orphan compaction from a crash mid-batch-3: must be ignored
    Seq((0L, 99L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/base/3")
    val Some((base, ov, tb)) =
      StreamingCcTakedown.loadPersisted(spark, dir)
    assert(base.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assert(ov.map(r => r.get(0) -> r.get(1)) === Seq(1L -> 1L))
    assert(tb === Seq(0L))
  }

  test("a persistDir with snapshots but NO eligible base epoch fails " +
      "with an explicit message, not an opaque empty-max crash") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_tdpr_bad").toString
    Seq(("t", 0L, Option.empty[Long]))
      .toDF("kind", "doc_id", "cluster_id")
      .write.parquet(s"$dir/state/2")
    val ex = intercept[IllegalStateException] {
      StreamingCcTakedown.loadPersisted(spark, dir)
    }
    assert(ex.getMessage.contains("no base epoch"))
  }
}
