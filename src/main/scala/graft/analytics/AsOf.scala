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
    val l = left.select(
      Seq(col(keyCol).as("__k"), col(seqCol).as("__s"),
        lit(0).as("__side"), leftPayload.as("__lp")) ++
        valueCols.map(v =>
          lit(null).cast(right.schema(v).dataType).as(s"$prefix$v")): _*)
    val r = right.select(
      Seq(col(keyCol).as("__k"), col(seqCol).as("__s"),
        lit(1).as("__side"),
        lit(null).cast(l.schema("__lp").dataType).as("__lp")) ++
        valueCols.map(v => col(v).as(s"$prefix$v")): _*)
    // right rows sort BEFORE left rows at equal seq (side desc) so an
    // equal-timestamp right row is visible to the left row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__s").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(Seq(col("__side"), col("__lp")) ++ valueCols.map(v =>
        last(col(s"$prefix$v"), ignoreNulls = true).over(w)
          .as(s"$prefix$v")): _*)
    carried.where(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(c => col(s"__lp.$c")) ++
        valueCols.map(v => col(s"$prefix$v")): _*)
  }
}
