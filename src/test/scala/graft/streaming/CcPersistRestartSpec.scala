package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Graphs

/** Crash-and-recover for the streaming cluster-map maintainer: the
  * standing label state must survive a DRIVER restart via `persistDir`
  * (base epochs + composed-remap snapshots, idempotent per-batchId
  * overwrites), not JVM memory — the r14 verdict's gap in the previous
  * in-memory-only carrier. The restart run is handed deliberately WRONG
  * `initialLabels` (every node a singleton) to prove recovery reads the
  * persisted state instead; the source checkpoint makes it replay only
  * unprocessed input.
  *
  * Runs once per compaction regime: bound 0 (state recovered from a
  * compacted BASE epoch) and the default bound (state recovered from a
  * remap SNAPSHOT over the initial base) — both recovery legs of
  * [[StreamingCcDelta.loadPersisted]]. */
class CcPersistRestartSpec extends AnyFunSuite with SparkTestBase {

  for ((regime, bound) <- Seq(("base-epoch", 0),
      ("remap-snapshot", StreamingCcDelta.DefaultCompactBound)))
    test(s"[$regime] stop between batches, restart with wrong " +
        "initialLabels: merges recovered from persistDir") {
      import spark.implicits._
      val dir =
        java.nio.file.Files.createTempDirectory("graft_ccpr").toString
      // history: {0,1}, {10,11}, {20,21}, isolated 30; phase-1 deltas
      // merge (1,10) and (11,20); phase-2 deltas merge (21,30) + the new
      // component (40,41)
      val histEdges = Seq((0L, 1L), (10L, 11L), (20L, 21L))
      val allIds =
        Seq(0L, 1L, 10L, 11L, 20L, 21L, 30L, 40L, 41L).toDF("doc_id")
      val histIds = allIds.where(col("doc_id") < 40L)
      val hist = Graphs.connectedComponents(histIds,
        histEdges.toDF("a", "b")).localCheckpoint()

      def run(edges: Seq[(Long, Long)], labels: org.apache.spark.sql
          .DataFrame): Map[Long, Long] = {
        edges.toDF("doc_a", "doc_b").repartition(1)
          .write.mode("append").parquet(s"$dir/in")
        StreamingCcDelta.maintain(
            spark.readStream.schema("doc_a BIGINT, doc_b BIGINT")
              .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
            labels, allIds, s"$dir/_ckpt", compactBound = bound,
            persistDir = Some(s"$dir/_state"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

      val phase1 = run(Seq((1L, 10L), (11L, 20L)), hist)
      assert(phase1 === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
        20L -> 0L, 21L -> 0L, 30L -> 30L, 40L -> 40L, 41L -> 41L))

      // "crash": the maintain call (and its in-memory state) is gone.
      // Restart with singleton labels — ONLY the persisted state knows
      // about history components and phase-1 merges.
      val wrong = allIds.select(col("doc_id"),
        col("doc_id").as("cluster_id"))
      val phase2 = run(Seq((21L, 30L), (40L, 41L)), wrong)
      assert(phase2 === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
        20L -> 0L, 21L -> 0L, 30L -> 0L, 40L -> 40L, 41L -> 40L),
        "restart lost persisted merges or replayed input non-idempotently")
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  test("recovery ignores a base epoch whose snapshot never landed " +
      "(crash between compaction write and snapshot write)") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ccpr_tail").toString
    val ids = Seq(0L, 1L, 2L).toDF("doc_id")
    val base = Seq((0L, 0L), (1L, 0L), (2L, 2L)).toDF("doc_id", "cluster_id")
    base.write.parquet(s"$dir/base/-1")
    Seq((2L, 0L)).toDF("__cn", "__new").write.parquet(s"$dir/remap/3")
    // a compaction that ran during batch 4 but crashed before batch 4's
    // snapshot write: must NOT be selected (its content is untrusted
    // mid-write; batch 4 will replay and redo it idempotently)
    Seq((0L, 99L), (1L, 99L), (2L, 99L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/base/4")
    val Some((gotBase, gotRemap)) =
      StreamingCcDelta.loadPersisted(spark, dir, "doc_id")
    assert(gotBase.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assert(gotRemap.map { case (k, v) =>
      k.asInstanceOf[Long] -> v.asInstanceOf[Long] } === Seq(2L -> 0L))
    assert(Graphs.composeLabels(gotBase,
        Some(gotRemap.map { case (k, v) =>
          (k.asInstanceOf[Long], v.asInstanceOf[Long]) }
          .toDF("__cn", "__new")),
        ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("a persistDir with snapshots but NO eligible base epoch fails " +
      "with an explicit message, not an opaque empty-max crash") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_ccpr_bad").toString
    // remap snapshot landed, base/-1 write failed (or partial copy):
    // recoverable-looking but incomplete
    Seq((2L, 0L)).toDF("__cn", "__new").write.parquet(s"$dir/remap/3")
    val ex = intercept[IllegalStateException] {
      StreamingCcDelta.loadPersisted(spark, dir, "doc_id")
    }
    assert(ex.getMessage.contains("no base epoch"))
  }
}
