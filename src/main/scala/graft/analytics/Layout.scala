package graft.analytics

import org.apache.spark.sql.Column
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
}
