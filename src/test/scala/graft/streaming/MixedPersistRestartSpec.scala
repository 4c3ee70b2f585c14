package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Graphs

/** Crash-and-recover for the MIXED streaming maintainer: remap,
  * override, tombstones, AND the added-edge layer must survive a DRIVER
  * restart via `persistDir`, not JVM memory — the r15 verdict's gap
  * (the mixed carrier is the production ingest shape, yet deferred
  * persistence to the single-op maintainers). The restart run is handed
  * deliberately WRONG `initialLabels` (every node a singleton) to prove
  * recovery reads the persisted state; runs under both compaction
  * regimes (bound 0 → state recovered from a compacted BASE + EDGES
  * epoch; default bound → from the tagged remap+override+tombstone
  * snapshot over the initial base, with the added-edge frames
  * reconstructed from their per-batch dirs). The streams themselves
  * carry no state-store operators — all state lives in `persistDir` —
  * so the state-store backend is irrelevant by construction. */
class MixedPersistRestartSpec extends AnyFunSuite with SparkTestBase {

  for ((regime, bound) <- Seq(("base-epoch", 0), ("snapshot", 10000)))
    test(s"[$regime] stop between batches, restart with wrong " +
        "initialLabels: merges, repairs, tombstones, and added edges " +
        "all recovered") {
      import spark.implicits._
      val dir =
        java.nio.file.Files.createTempDirectory("graft_mxpr").toString
      // history: {0,1}, {10,11}, {20,21}, isolated 30, 40; 50,51 unseen
      val ids = Seq(0L, 1L, 10L, 11L, 20L, 21L, 30L, 40L, 50L, 51L)
        .toDF("doc_id")
      val hist = Seq((0L, 1L), (10L, 11L), (20L, 21L))
      val labels = Graphs.connectedComponents(ids, hist.toDF("a", "b"))
        .localCheckpoint()

      def run(ops: Seq[(String, Long, Long)],
          lbl: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
        ops.toDF("op", "a", "b").repartition(1)
          .write.mode("append").parquet(s"$dir/in")
        StreamingCcMixed.maintain(
            spark.readStream.schema("op STRING, a BIGINT, b BIGINT")
              .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
            lbl, hist.toDF("a", "b"), ids, s"$dir/_ckpt",
            compactBound = bound, persistDir = Some(s"$dir/_state"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

      // phase 1: merge {0,1}+{10,11} via (1,10); rm 20 (splits {20,21});
      // add (50,51) — a brand-new component
      val phase1 = run(Seq(("add", 1L, 10L), ("rm", 20L, -1L),
        ("add", 50L, 51L)), labels)
      assert(phase1 === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
        21L -> 21L, 30L -> 30L, 40L -> 40L, 50L -> 50L, 51L -> 50L))

      // "crash": restart with singleton labels — only the persisted
      // state knows the phase-1 merge, repair, tombstone, and the ADDED
      // edge (1,10) (the phase-2 rm 0 repair MUST see it to keep
      // 1/10/11 connected after 0 leaves). The (40,20) add must DIE:
      // 20 is tombstoned — in the bound-0 regime it was folded into the
      // base by compaction, so this also pins the folded-removal
      // no-resurrection probe.
      val wrong = ids.select(col("doc_id"), col("doc_id").as("cluster_id"))
      val phase2 = run(Seq(("rm", 0L, -1L), ("add", 40L, 20L)), wrong)
      assert(phase2 === Map(1L -> 1L, 10L -> 1L, 11L -> 1L, 21L -> 21L,
        30L -> 30L, 40L -> 40L, 50L -> 50L, 51L -> 50L),
        "restart lost persisted mixed state, dropped the recovered " +
          "added edge from the repair graph, or resurrected a removed " +
          "node")
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  test("forced replay of a COMPACTING fold: the replayed batch is " +
      "skipped and its effects come from the recovered epoch — " +
      "nothing lost, nothing doubled") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_mxpr_rp").toString
    val ids = Seq(0L, 1L, 10L, 11L, 20L, 21L, 30L, 40L).toDF("doc_id")
    val hist = Seq((0L, 1L), (10L, 11L), (20L, 21L))
    val labels = Graphs.connectedComponents(ids, hist.toDF("a", "b"))
      .localCheckpoint()
    def run(ops: Seq[(String, Long, Long)],
        lbl: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      ops.toDF("op", "a", "b").repartition(1)
        .write.mode("append").parquet(s"$dir/in")
      StreamingCcMixed.maintain(
          spark.readStream.schema("op STRING, a BIGINT, b BIGINT")
            .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
          lbl, hist.toDF("a", "b"), ids, s"$dir/_ckpt",
          compactBound = 0, persistDir = Some(s"$dir/_state"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // batch 0 = [(add 1,10), (rm 20)] with bound 0 → a real compaction
    // at epoch 0 (base/0 + edges/0 hold the batch's full effect)
    val phase1 = run(Seq(("add", 1L, 10L), ("rm", 20L, -1L)), labels)
    assert(phase1 === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
      21L -> 21L, 30L -> 30L, 40L -> 40L))
    // crash after the state write, before the sink commit
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/_ckpt/commits/.0.crc"))
    // restart with singleton labels: batch 0 replays (skipped — its
    // merge and tombstone MUST come from the recovered base), then
    // batch 1 merges 30/40 and re-add of tombstoned 20 dies
    val wrong = ids.select(col("doc_id"), col("doc_id").as("cluster_id"))
    val phase2 = run(Seq(("add", 30L, 40L), ("add", 20L, 21L)), wrong)
    assert(phase2 === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
      21L -> 21L, 30L -> 30L, 40L -> 30L),
      "skipped replay lost the compacted batch's effects, or the " +
        "tombstoned id resurrected")
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("recovery ignores base/edges epochs whose snapshot never landed " +
      "(torn compaction) and reconstructs added frames from their dirs") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_mxpr_tail").toString
    Seq((0L, 0L), (1L, 0L), (2L, 2L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/base/-1")
    // batch 2's snapshot: remap (2→0), tombstone 5, no override
    Seq(("r", 2L, Option(0L)), ("t", 5L, Option.empty[Long]))
      .toDF("kind", "doc_id", "cluster_id")
      .write.parquet(s"$dir/state/2")
    Seq((1L, 2L)).toDF("__a", "__b").write.parquet(s"$dir/added/2")
    // torn compaction during batch 3 (base + edges written, snapshot
    // not): both orphans must be ignored
    Seq((0L, 99L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$dir/base/3")
    Seq((9L, 9L)).toDF("__a", "__b").write.parquet(s"$dir/edges/3")
    Seq((7L, 8L)).toDF("__a", "__b").write.parquet(s"$dir/added/3")
    val Some(rec) = StreamingCcMixed.loadPersisted(spark, dir)
    assert(!rec.baseIsUniverse)
    assert(rec.base.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assert(rec.edges.isEmpty, "orphan edges epoch leaked into recovery")
    assert(rec.added.map(_.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq) === Seq(Seq((1L, 2L))),
      "added frames should include batch 2 only (batch 3 replays)")
    assert(rec.remap === Seq(2L -> 0L))
    assert(rec.overrideRows.isEmpty)
    assert(rec.tomb === Seq(5L))
  }

  test("a persistDir with snapshots but NO eligible base epoch fails " +
      "with an explicit message, not an opaque empty-max crash") {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("graft_mxpr_bad").toString
    Seq(("t", 0L, Option.empty[Long]))
      .toDF("kind", "doc_id", "cluster_id")
      .write.parquet(s"$dir/state/2")
    val ex = intercept[IllegalStateException] {
      StreamingCcMixed.loadPersisted(spark, dir)
    }
    assert(ex.getMessage.contains("no base epoch"))
  }
}
