package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout keys for multi-dimensional scan pruning.
  *
  * Sorting 100 TB of parquet by ONE column gives tight row-group min/max
  * statistics — and therefore scan pruning — on that column only; a
  * predicate on any other dimension reads everything. Sorting by a
  * space-filling curve interleaves the dimensions, so every file/row-group
  * covers a small HYPER-RECTANGLE of the key space and predicates on ANY
  * participating dimension prune (the technique behind Delta/Iceberg
  * Z-ORDER clustering). The key is a plain deterministic integer
  * expression — computed map-side, codegen'd bit arithmetic, no shuffle of
  * its own; the caller pays one range-repartition + local sort at write
  * time, once, to make every later multi-dimensional scan cheap.
  */
object Layout {

  /** Z-order (Morton) key: interleaves the low `bits` bits of two
    * non-negative integer columns — x's bit i lands at even position 2i,
    * y's at odd position 2i+1. Callers quantize to `bits` first (clamp or
    * bucket); 2·`bits` ≤ 62 keeps the key in a BIGINT. The expansion is
    * `bits` masked shifts per column OR-folded together — all codegen'd
    * integer primitives inside one whole-stage-codegen span. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Small-file compaction (the maintenance half of OPTIMIZE): plan `df`
    * into `ceil(rows / targetRows)` output partitions so a subsequent
    * parquet write produces that many right-sized files instead of the
    * accumulated small ones (a 100 TB table ingested in thousands of
    * micro-batches otherwise degrades every scan with per-file open cost
    * and starves row-group statistics).
    *
    * With `clusterBy` columns the rewrite simultaneously CLUSTERS: a
    * range repartition + local sort on those columns (pass a
    * [[zorderKey]] for multi-dimensional locality — together they are the
    * OPTIMIZE ZORDER shape), so file min/max stats prune future scans.
    * Without, a round-robin repartition balances file sizes exactly.
    *
    * One count job + one shuffle; returns the row count so callers can
    * assert nothing was lost. */
  def compactionPlan(df: DataFrame, targetRows: Long,
      clusterBy: Seq[Column] = Nil): (DataFrame, Long) = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val n = df.count()
    // clamped: past Int.MaxValue files the .toInt would wrap NEGATIVE and
    // repartition throws after the count job already ran
    val files = math.min(
      math.max(1L, (n + targetRows - 1) / targetRows),
      Int.MaxValue.toLong).toInt
    val planned =
      if (clusterBy.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*)
    (planned, n)
  }

  /** The planner's ROW output: assign every file of a small-file listing
    * to a compaction group of ~`targetBytes`. Files are laid out in
    * ascending `fileCol` order and the byte stream is cut every
    * `targetBytes`; a file belongs to the group where it BEGINS — i.e.
    * the plan IS a budget packing of the listing, so it delegates to
    * [[Packing.packByBudget]] and inherits its scale shape (two-phase
    * distributed prefix sum, never a single-task global window) and its
    * determinism (pure integer arithmetic — the same listing always
    * yields the same plan, which is what lets a scheduler resume a
    * half-finished compaction). Each group's files sum to ≥ targetBytes
    * only when cut mid-file (greedy packing's standard overshoot);
    * `fileCol` must be unique, `sizeCol` integral and non-negative
    * (violations fail loudly, per packByBudget's contract). */
  def compactionGroups(listing: DataFrame, fileCol: String,
      sizeCol: String, targetBytes: Long,
      groupCol: String = "group_id"): DataFrame =
    Packing.packByBudget(listing, orderCol = fileCol, weightCol = sizeCol,
      budget = targetBytes, shardCol = groupCol)
}
