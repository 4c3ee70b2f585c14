package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-light exact percentiles — the same answer as Spark's
  * `percentile()` aggregate, computed as a SORT over the value HISTOGRAM
  * instead of a hash-map aggregation buffer (optimization guide §2.3
  * "aggregate before you shuffle" + §1.2 "fix the distributed algorithm").
  *
  * Why: `percentile(v, ps)` builds an OpenHashMap(value → count) per
  * partial, serializes EVERY map across the exchange, and merges them
  * single-threaded in the final aggregation — for a high-NDV column the
  * partials are each ~NDV entries, so the shuffle carries
  * partitions × NDV map entries and the merge is the straggler (q183's
  * 7 s profile: 583k distinct doubles × 32 partials). This module gets
  * the identical result from relational pieces that all enjoy map-side
  * partial aggregation and whole-stage codegen:
  *
  *   1. `GROUP BY (group, v) → cnt` — the value histogram; the exchange
  *      carries ~NDV rows ONCE (not per partition: partial aggregation
  *      collapses duplicates map-side).
  *   2. One window pass per group ordered by v: running count `cum` and
  *      group total `n` (same partitioning, one Exchange; the sort
  *      spills via UnsafeExternalSorter instead of holding a map).
  *   3. Each requested percentile needs exactly two order statistics —
  *      the values at 0-based positions floor(p·(n−1)) and ceil(p·(n−1));
  *      a row of the histogram covers position k iff
  *      cum − cnt ≤ k < cum, so conditional MIN/MAX aggregates pick both
  *      keys in ONE final group-sized aggregation.
  *
  * The interpolation reproduces
  * `catalyst.expressions.aggregate.Percentile.getPercentile` arithmetic
  * step for step — position = (n−1)·p in one double product, lower/higher
  * as floor/ceil longs, result
  * `(higher − position)·lowerKey + (position − lower)·higherKey` with the
  * same promotions — so results are bit-identical, not merely close
  * (PercentilesSpec pins equality against the built-in on adversarial
  * tie-heavy multisets). Nulls are excluded exactly as the built-in does.
  *
  * Scale shape: per-group window state is bounded by the group's NDV and
  * spills; the built-in's buffer is the same NDV held as ONE in-memory
  * map per task and shipped whole. For corpus-NDV columns the mergeable
  * sketch (q70) remains the documented 100 TB default; this is the exact
  * path both engines can afford.
  */
object Percentiles {

  /** Exact per-group column profile: one histogram+window pass yielding
    * `groupCol, __n (non-null count), __ndv, __min, __max, __pct0..k`
    * (one `__pct<i>` per requested percentage, double, bit-equal to
    * `percentile(valueCol, percentages)`). Rows whose value is null are
    * excluded from every statistic, exactly as the built-in aggregates
    * (callers whose `n` must count null rows add that separately). */
  def profile(df: DataFrame, groupCol: String, valueCol: String,
      percentages: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    // Running count via the GROUPED TWO-PHASE prefix sum
    // (Packing.takeByBudgetPerGroup's shape, same hazards handled the
    // same way): a `Window.partitionBy(group)` would sort each group's
    // whole histogram on ONE task — the biggest column profiled is then
    // a serial sort of its NDV (and at corpus scale, a straggler).
    // Range-partition by (group, v) instead, running-sum within
    // (partition, group) in parallel, and close the seams with the tiny
    // per-(partition, group) totals window broadcast back.
    // localCheckpoint freezes the sampled range bounds across the
    // offsets job and the final job (without it the two executions can
    // disagree on row placement and corrupt the cumulative counts).
    val local = counts
      .repartitionByRange(p, col(groupCol), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lc",
        sum(col("__cnt")).over(
          Window.partitionBy(col("__pid"), col(groupCol))
            .orderBy(col("__v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val piece = local.groupBy(col("__pid"), col(groupCol))
      .agg(max(col("__lc")).as("__t"))
    val offsets = piece
      .withColumn("__off",
        coalesce(sum(col("__t")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n",
        sum(col("__t")).over(Window.partitionBy(col(groupCol))))
      .select(col("__pid"), col(groupCol), col("__off"), col("__n"))
    val cum = local.join(broadcast(offsets), Seq("__pid", groupCol))
      .withColumn("__cum", col("__lc") + col("__off"))
    // 0-based target positions, one double product exactly as Percentile:
    // position = maxPosition * percentage with maxPosition = n - 1
    val pos = percentages.indices.map(i =>
      ((col("__n") - 1) * lit(percentages(i))).as(s"__pos$i"))
    val withPos = cum.select(
      col(groupCol) +: col("__v") +: col("__cnt") +: col("__cum") +:
        col("__n") +: pos: _*)
    def covers(k: Column): Column =
      col("__cum") - col("__cnt") <= k && k < col("__cum")
    val pctAggs = percentages.indices.flatMap { i =>
      val p = col(s"__pos$i")
      Seq(
        max(when(covers(floor(p)), col("__v"))).as(s"__lk$i"),
        max(when(covers(ceil(p)), col("__v"))).as(s"__hk$i"),
        // position is constant within a group (it depends only on n)
        max(p).as(s"__p$i"))
    }
    val allAggs = count(lit(1)).as("__ndv") +:
      min(col("__v")).as("__min") +: max(col("__v")).as("__max") +: pctAggs
    val base = withPos.groupBy(col(groupCol))
      .agg(sum(col("__cnt")).as("__n"), allAggs: _*)
    val finalized = percentages.indices.map { i =>
      val p = col(s"__p$i")
      val lower = floor(p)
      val higher = ceil(p)
      when(higher === lower, col(s"__lk$i"))
        .when(col(s"__hk$i") === col(s"__lk$i"), col(s"__lk$i"))
        .otherwise((higher - p) * col(s"__lk$i") +
          (p - lower) * col(s"__hk$i"))
        .as(s"__pct$i")
    }
    base.select(col(groupCol) +: col("__n") +: col("__ndv") +:
      col("__min") +: col("__max") +: finalized: _*)
  }
}
