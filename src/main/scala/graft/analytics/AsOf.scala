package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join as a library operator.
  *
  * For each left row, attach the value columns of the LATEST right row
  * with `right.seqCol <= left.seqCol` within the same `keyCol` (left rows
  * with no earlier right row get nulls).
  *
  * Implementation: tag both sides, union, and run ONE keyed window with a
  * running `last(..., ignoreNulls)` — a single hash-shuffle by key plus a
  * per-partition sort, cost O(n log n) per key shard. The naive range
  * join (`l.seq >= r.seq` + max-per-left) explodes quadratically in hot
  * keys; Spark has no native as-of join, and this union-window shape is
  * the standard scalable encoding. Ties (equal seq) resolve to the right
  * row being visible (<=), via the side-aware sort order.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      seqCol: String, valueCols: Seq[String], prefix: String = "asof_")
      : DataFrame = {
    val leftPayload = struct(left.columns.toIndexedSeq.map(col): _*)
    // The right side's value columns travel as ONE struct so that every
    // carried value comes from the SAME latest right row: last(struct,
    // ignoreNulls) skips left rows (whole struct null) but keeps a matched
    // right row's interior NULLs, instead of back-filling each column
    // independently from different (older) right rows.
    val rightPayload = struct(valueCols.toIndexedSeq.map(col): _*)
    val l = left.select(
      col(keyCol).as("__k"), col(seqCol).as("__s"),
      lit(0).as("__side"), leftPayload.as("__lp"),
      lit(null).cast(right.select(rightPayload).schema.head.dataType)
        .as("__rv"))
    // join semantics for dirty data: a right row with a NULL key or NULL
    // seq matches NOTHING (as in any SQL join / ASOF JOIN) — unfiltered,
    // a NULL seq sorts FIRST in its partition (asc = nulls first) and
    // would be carried as the "latest earlier match" of every left row
    // before the first real right row
    val r = right
      .where(col(keyCol).isNotNull && col(seqCol).isNotNull)
      .select(
        col(keyCol).as("__k"), col(seqCol).as("__s"),
        lit(1).as("__side"),
        lit(null).cast(l.schema("__lp").dataType).as("__lp"),
        rightPayload.as("__rv"))
    // right rows sort BEFORE left rows at equal seq (side desc) so an
    // equal-timestamp right row is visible to the left row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__s").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(col("__side"), col("__lp"),
        last(col("__rv"), ignoreNulls = true).over(w).as("__rv"))
    carried.where(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(c => col(s"__lp.$c")) ++
        valueCols.map(v => col(s"__rv.$v").as(s"$prefix$v")): _*)
  }
}
