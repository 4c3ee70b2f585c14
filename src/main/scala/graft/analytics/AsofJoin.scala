package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the time-series / feature-store operator
  * Spark's join zoo lacks: for every left row, attach the LATEST right
  * row of the same key whose timestamp is ≤ the left row's (ties at
  * equal timestamps count as visible). The canonical uses: trades←quotes,
  * event←latest-model-score, request←latest-config.
  *
  * Scale shape — ONE shuffle, no range probe: both sides union into one
  * frame tagged by side, shuffle once on the key, and a single per-key
  * ordered window pass (`last(..., ignoreNulls)` over rows-unbounded-
  * preceding) carries each right value forward to the left rows after
  * it. This is the standard distributed as-of form: cost is
  * sort-within-partition, state is one row per value column, and skew
  * behaves exactly like any keyed aggregation (a hot key is one big
  * sorted run, never a nested loop). The naive alternatives both fail at
  * 100 TB: a theta-join `l.ts >= r.ts` is a per-key cross product, and a
  * per-left-row subquery probe is a join per row.
  *
  * Contract: `right` must be UNIQUE per (key, ts) — pre-aggregate it
  * (e.g. max per key+ts) if it is not; with duplicates the equal-ts
  * winner would be partition-order-dependent, silently nondeterministic.
  * Left rows before any right row get NULL (the honest answer; coalesce
  * downstream if a default is wanted).
  */
object AsofJoin {

  /** As-of join `left` (any columns) with `right` (keyCols ++ tsCol ++
    * valueCols); every `valueCols` entry `c` lands on the left frame as
    * `asof_c`. `tsCol` must exist on both sides under the same name and
    * an ordered type. */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val u = unionTagged(left, right, keyCols, tsCol, valueCols)
    // right rows sort BEFORE left rows at an equal timestamp, so a value
    // stamped at exactly t is visible to a left row at t
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols
      .foldLeft(u) { (df, c) =>
        df.withColumn(s"asof_$c",
          last(col(s"asof_$c"), ignoreNulls = true).over(w))
      }
      .where(col("__isL") === 1)
      .drop("__isL")
  }

  /** Skew-hardened [[asof]] — identical results (AsofJoinSpec proves
    * equality on random inputs across bucket widths), different physical
    * shape for a HOT KEY. The plain form sorts each key in ONE window
    * partition: a key holding 10⁹ rows of a 100 TB corpus becomes one
    * straggler task (or an OOM). Here time is cut into width-`bucket`
    * ranges and the carry runs in two skew-bounded passes:
    *
    *   1. within (key, bucket): the same ordered carry — partitions are
    *      now (key, bucket), so a hot key spreads over its time range;
    *   2. across buckets: each bucket's LAST right value (a keyed
    *      `max_by` aggregate) forms a per-key spine of at most
    *      #buckets rows; one window over the SPINE (not the rows)
    *      prefix-carries it, and left rows whose within-bucket carry is
    *      null fill from the spine join.
    *
    * Cost: two extra exchanges on (key, bucket)-sized frames; the
    * per-key serial work drops from the key's row count to its bucket
    * count. Pick `bucket` so a busy key has ≫ partitions-many buckets
    * (e.g. an hour of ns for event streams). */
  def asofBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String], bucket: Long): DataFrame = {
    require(bucket >= 1, s"AsofJoin: bucket width must be >= 1, got $bucket")
    val u = unionTagged(left, right, keyCols, tsCol, valueCols)
      .withColumn("__bkt", floor(col(tsCol) / lit(bucket)).cast("long"))
    val keyBkt = keyCols :+ "__bkt"
    // pass 1: ordered carry WITHIN each (key, bucket)
    val wLocal = Window.partitionBy(keyBkt.map(col): _*)
      .orderBy(col(tsCol).asc, col("__isL").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(wLocal))
    }
    // pass 2: per-key spine of bucket-final right values, prefix-carried
    // over STRICTLY EARLIER buckets (within-bucket rows came from pass 1)
    val bucketLast = u.where(col("__isL") === 0)
      .groupBy(keyBkt.map(col): _*)
      .agg(max_by(col(s"asof_${valueCols.head}"), col(tsCol))
          .as(s"__bl_${valueCols.head}"),
        valueCols.tail.map(c =>
          max_by(col(s"asof_$c"), col(tsCol)).as(s"__bl_$c")): _*)
    val spine = u.select(keyBkt.map(col): _*).distinct()
      .join(bucketLast, keyBkt, "left")
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = valueCols.foldLeft(spine) { (df, c) =>
        df.withColumn(s"__ci_$c",
          last(col(s"__bl_$c"), ignoreNulls = true).over(wCarry))
      }
      .select(keyBkt.map(col) ++ valueCols.map(c => col(s"__ci_$c")): _*)
    val filled = local.where(col("__isL") === 1).join(carry, keyBkt)
    valueCols.foldLeft(filled) { (df, c) =>
        df.withColumn(s"asof_$c",
          coalesce(col(s"asof_$c"), col(s"__ci_$c")))
      }
      .drop("__isL" +: "__bkt" +: valueCols.map(c => s"__ci_$c"): _*)
  }

  /** Shared construction: both sides union-tagged into one frame —
    * (keys…, ts, left-only columns (null on right rows), asof_-prefixed
    * value columns (null on left rows), __isL). */
  private def unionTagged(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "AsofJoin: need at least one key column")
    require(valueCols.nonEmpty, "AsofJoin: need at least one value column")
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    valueCols.foreach(c => require(rTypes.contains(c),
      s"AsofJoin: right side lacks value column $c"))
    val leftOther =
      left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    valueCols.foreach(c => require(!left.columns.contains(s"asof_$c"),
      s"AsofJoin: left already has a column named asof_$c"))
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val keyTs: Seq[Column] = (keyCols :+ tsCol).map(col)
    val l = left.select(keyTs ++ leftOther.map(col) ++
      valueCols.map(c => lit(null).cast(rTypes(c)).as(s"asof_$c")) :+
      lit(1).as("__isL"): _*)
    val r = right.select(keyTs ++
      leftOther.map(c => lit(null).cast(lTypes(c)).as(c)) ++
      valueCols.map(c => col(c).as(s"asof_$c")) :+
      lit(0).as("__isL"): _*)
    l.unionByName(r)
  }
}
