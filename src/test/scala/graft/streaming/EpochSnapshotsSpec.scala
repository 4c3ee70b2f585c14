package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The shared epoch-snapshot core's rules, pinned ONCE (r17 verdict
  * next-round #1): the three maintainers delegate recovery to
  * [[EpochSnapshots.load]], so the newest-snapshot ≤ rule, the
  * incomplete-dir guard, the added-gate filter, and the replay-skip
  * boundary live here instead of three per-maintainer copies. The
  * per-maintainer restart suites keep the end-to-end crash paths. */
class EpochSnapshotsSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_es_$tag").toString

  test("load: newest snapshot wins; primary/secondary epochs above it " +
      "(torn compaction) are ignored; added frames gate on the " +
      "secondary coalesce epoch") {
    import spark.implicits._
    val dir = tmp("rule")
    Seq(1L).toDF("v").write.parquet(s"$dir/base/-1")
    Seq(2L).toDF("v").write.parquet(s"$dir/side/1")
    Seq(10L).toDF("v").write.parquet(s"$dir/added/1") // ≤ gate: folded
    Seq(11L).toDF("v").write.parquet(s"$dir/added/2")
    Seq(9L).toDF("v").write.parquet(s"$dir/state/2")
    // torn batch-3 orphans — every sub, all ignored
    Seq(99L).toDF("v").write.parquet(s"$dir/base/3")
    Seq(99L).toDF("v").write.parquet(s"$dir/side/3")
    Seq(99L).toDF("v").write.parquet(s"$dir/added/3")
    val Some(l) = EpochSnapshots.load(spark, dir, "T",
      primarySub = "base", secondarySubs = Seq("side", "absent"),
      addedGateSub = "side")
    assert(l.through === 2L && l.primaryEpoch === -1L)
    assert(l.primary.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(l.secondary.keySet === Set("side"),
      "an absent secondary must be absent, not an empty frame")
    assert(l.secondary("side").collect().map(_.getLong(0)).toSeq ===
      Seq(2L))
    assert(l.added.map(_.collect().map(_.getLong(0)).toSeq) ===
      Seq(Seq(11L)),
      "added/1 is at the side coalesce epoch — already folded in")
    assert(l.stateRows.map(_.getLong(0)) === Seq(9L))
  }

  test("load: when the primary IS the coalesce artifact, added frames " +
      "gate on the recovered primary epoch") {
    import spark.implicits._
    val dir = tmp("pgate")
    Seq(1L).toDF("v").write.parquet(s"$dir/postings/1")
    Seq(10L).toDF("v").write.parquet(s"$dir/added/1")
    Seq(11L).toDF("v").write.parquet(s"$dir/added/2")
    Seq.empty[Long].toDF("v").write.parquet(s"$dir/state/2")
    val Some(l) = EpochSnapshots.load(spark, dir, "T",
      primarySub = "postings", secondarySubs = Seq.empty,
      addedGateSub = "postings")
    assert(l.added.map(_.collect().map(_.getLong(0)).toSeq) ===
      Seq(Seq(11L)))
  }

  test("load: no snapshot at all = fresh start (None); a snapshot " +
      "with NO eligible primary = incomplete dir (explicit failure)") {
    import spark.implicits._
    val fresh = tmp("fresh")
    Seq(1L).toDF("v").write.parquet(s"$fresh/base/-1")
    assert(EpochSnapshots.load(spark, fresh, "T", "base", Seq.empty,
      "base").isEmpty)
    val broken = tmp("broken")
    Seq(9L).toDF("v").write.parquet(s"$broken/state/2")
    val ex = intercept[IllegalStateException] {
      EpochSnapshots.load(spark, broken, "T", "base", Seq.empty, "base")
    }
    assert(ex.getMessage.contains("no base epoch"))
  }

  test("alreadyApplied: the replay-skip boundary is batchId <= the " +
      "recovered snapshot, and a fresh start never skips") {
    assert(EpochSnapshots.alreadyApplied(2L, 1L, "T"))
    assert(EpochSnapshots.alreadyApplied(2L, 2L, "T"))
    assert(!EpochSnapshots.alreadyApplied(2L, 3L, "T"))
    assert(!EpochSnapshots.alreadyApplied(Long.MinValue, 0L, "T"))
  }

  test("FrameLedger: union appends in order, overCap trips past " +
      "FrameCap, reset drops every recent frame") {
    import spark.implicits._
    val led = new EpochSnapshots.FrameLedger(
      Seq(0L).toDF("v"), initiallyOwned = false)
    (1 to EpochSnapshots.FrameCap)
      .foreach(i => led.append(Seq(i.toLong).toDF("v")))
    assert(!led.overCap && led.frameCount === EpochSnapshots.FrameCap + 1)
    led.append(Seq(99L).toDF("v"))
    assert(led.overCap)
    assert(led.union.collect().map(_.getLong(0)).toSeq ===
      (0L to EpochSnapshots.FrameCap.toLong) :+ 99L)
    led.reset(Seq(7L).toDF("v").localCheckpoint())
    assert(led.frameCount === 1 && !led.overCap)
    assert(led.union.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("RemovedSlot: starts empty or materialized, merge accumulates " +
      "the permanent-takedown floor") {
    import spark.implicits._
    val slot = new EpochSnapshots.RemovedSlot(None)
    assert(slot.get.isEmpty)
    slot.merge(Seq(1L).toDF("v"))
    slot.merge(Seq(2L, 3L).toDF("v"))
    assert(slot.get.get.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
  }

  private def ovSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cluster_id",
      org.apache.spark.sql.types.LongType)))
  private def row(id: Long, c: Long) = org.apache.spark.sql.Row(id, c)
  private def rowsOf(l: EpochSnapshots.OverrideLedger): Set[(Long, Long)] =
    l.frame.map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  test("OverrideLedger: driver-held merge supersedes by key, drops the " +
      "removal keys, sizes without a job; clear empties") {
    val l = new EpochSnapshots.OverrideLedger(spark, ovSchema,
      Seq(row(1L, 10L), row(2L, 10L), row(3L, 30L)))
    assert(l.size === 3 && !l.spilled)
    // key 1 re-repaired, key 2 removed, key 4 new
    l.merge(Seq(row(1L, 11L), row(4L, 40L)), drop = Seq(2L))
    assert(l.size === 3)
    assert(l.keys.toSet === Set(1L, 3L, 4L))
    assert(rowsOf(l) === Set((1L, 11L), (3L, 30L), (4L, 40L)))
    l.clear()
    assert(l.size === 0 && l.frame.isEmpty)
  }

  test("OverrideLedger: a merge whose fresh rows also appear in drop " +
      "keeps the fresh rows (fresh wins; drop covers the affected set)") {
    val l = new EpochSnapshots.OverrideLedger(spark, ovSchema, Seq.empty)
    l.merge(Seq(row(5L, 50L)), drop = Seq(5L, 6L))
    assert(rowsOf(l) === Set((5L, 50L)))
  }

  test("OverrideLedger: spill flips one-way to a distributed frame " +
      "with identical contents; post-spill merges stay correct") {
    import spark.implicits._
    val l = new EpochSnapshots.OverrideLedger(spark, ovSchema,
      Seq(row(1L, 10L), row(2L, 20L)))
    // distributed repair supersedes key 1, key 2 is removed
    l.spill(Seq((1L, 11L), (7L, 70L)).toDF("id", "cluster_id"),
      drop = Seq(2L))
    assert(l.spilled && l.size === 2)
    assert(rowsOf(l) === Set((1L, 11L), (7L, 70L)))
    intercept[IllegalStateException](l.keys)
    // a later bounded repair merges through the distributed path
    l.merge(Seq(row(7L, 71L), row(8L, 80L)), drop = Seq(1L))
    assert(l.spilled && l.size === 2 + 0,
      "7 superseded, 1 dropped, 8 added: {7, 8}")
    assert(rowsOf(l) === Set((7L, 71L), (8L, 80L)))
    l.clear()
    assert(!l.spilled && l.size === 0 && l.frame.isEmpty)
  }
}
