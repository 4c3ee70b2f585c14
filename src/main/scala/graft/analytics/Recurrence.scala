package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-recurrence scans over keyed, time-ordered data — the EWMA /
  * exponential-decay family every monitoring and feature pipeline needs
  * (`e_i = α·x_i + (1−α)·e_{i−1}`, seeded `e_1 = x_1`), computed with no
  * per-row sequential UDF, no collect-the-series, and error below 1 ulp
  * of the result (see the truncation note on [[ewma]]).
  *
  * Why not the obvious forms:
  *  - a per-key `collect_list` + fold holds the whole series per key in
  *    one task's memory — dead at 100 TB;
  *  - the closed form `e_i = Σ m^{i−j} c_j = m^i · Σ c_j m^{−j}` turns
  *    the recurrence into one windowed running sum, but `m^{−j}`
  *    overflows double range after a few hundred rows (0.8^−1000 ≈
  *    10^97).
  *
  * The fix is the standard SEGMENTED-SCAN factoring: split each key's
  * series into fixed blocks of `block` rows; inside a block the closed
  * form is safe (exponents bounded by `block−1`, guarded), and the carry
  * across blocks is the same recurrence over one row per block with the
  * CONSTANT multiplier `m^block` (every carry-source block is full),
  * whose geometric decay makes a bounded lag window exact to below
  * double precision. Cost: one shuffle on the key, ordered window
  * passes, a block-spine window, one co-partitioned join back — no
  * per-key state beyond the window sort anywhere.
  *
  * Skew behaves like any keyed window: a hot key is one big sorted run,
  * never a cross product — and [[ewmaBucketed]] removes even that run by
  * partitioning the scan on (key, time bucket).
  */
object Recurrence {

  /** Smallest lag horizon W with m^(W·block) ≤ 1e−18: carry terms past W
    * spine rows are below 1e−18 × the value scale — under 1 ulp of any
    * non-degenerate result (double arithmetic itself discards more), so
    * the W-term window is exact in every observable sense. */
  private def lagHorizon(m: Double, block: Int): Int = {
    val w = math.ceil(math.log(1e-18) / (block * math.log(m))).toInt
    math.max(w, 1)
  }

  /** Adds column `ewma` to `df`: the exponentially weighted moving
    * average of `valueCol` per `keyCols` group in `orderCols` order
    * (`e_1 = x_1`, `e_i = α·x_i + (1−α)·e_{i−1}`).
    *
    * `block` bounds the in-block exponent: the largest rescale factor is
    * `(1−α)^−(block−1)`, and rescale-induced error is ~1e−16 × that
    * factor (relative to the value scale). The guard below caps the
    * factor at 1e6, so the ENFORCED absolute error bound is ~1e−10 ×
    * the value scale — callers gating on rounded values are safe by
    * orders of magnitude. A fast decay (large α) overflows the guard at
    * the default block (α ≥ ~0.36 at block = 32): SHRINK `block` (e.g.
    * α = 0.5 needs block ≤ 20; block = 16 is spec-pinned to < 1e−10).
    * A slow decay (small α) with a small block widens the spine lag
    * horizon instead — that guard points the other way: grow `block`
    * when α is small. */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      valueCol: String, alpha: Double, block: Int = 32): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"Recurrence.ewma: alpha must be in (0,1), got $alpha")
    require(block >= 1, s"Recurrence.ewma: block must be >= 1, got $block")
    val m = 1.0 - alpha
    val maxScale = math.pow(m, -(block - 1).toDouble)
    // 1e6 keeps the documented ~1e-10 absolute bound true: error is
    // ~1e-16 × maxScale (a 1e12 guard would silently admit ~1e-4).
    require(maxScale < 1e6,
      s"Recurrence.ewma: (1-alpha)^-(block-1) = $maxScale exceeds the " +
        "precision guard (1e6); shrink block for this alpha")
    val horizon = lagHorizon(m, block)
    require(horizon <= 256,
      s"Recurrence.ewma: spine lag horizon $horizon exceeds 256; grow " +
        "block for this alpha")

    val key = keyCols.map(col)
    // (no partition pins here: the q191 repartition treatment was tried
    // in r18 and MEASURED WORSE — q201 2.9 s → 4.0 s, task-time 2.7 s →
    // 47 s: the window passes are byte-tiny AND row-cheap, so AQE's
    // coalesced few-task plan beats 32 pinned tasks' per-task overhead,
    // exactly the q208 containment-probe shape)
    val wRn = Window.partitionBy(key: _*).orderBy(orderCols: _*)
    val base = df
      .withColumn("__rn", row_number().over(wRn) - lit(1))
      .withColumn("__blk", (col("__rn") / lit(block)).cast("long"))
      .withColumn("__jl", (col("__rn") % lit(block)).cast("int"))
      // c_i: the recurrence's per-row input (seed row enters whole)
      .withColumn("__c",
        when(col("__rn") === 0, col(valueCol))
          .otherwise(lit(alpha) * col(valueCol)))

    // within-block closed form: local_i = m^jl · Σ_{j≤i} c_j · m^−jl_j
    // — MATERIALIZED (guide §5): `local` feeds both the block spine and
    // the final join, so the whole rank/blocking/window chain otherwise
    // executed twice (and through ewmaBucketed, up to four times; the
    // r19 probe put q201's regression behind exactly these re-runs,
    // serialized onto the spine's 1–2-task broadcast builds)
    val wBlk = Window.partitionBy((key :+ col("__blk")): _*)
      .orderBy(col("__rn").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = Graphs.flatCheckpoint(base
      .withColumn("__u", col("__c") * pow(lit(m), -col("__jl")))
      .withColumn("__local",
        pow(lit(m), col("__jl")) * sum(col("__u")).over(wBlk)))

    // Block spine: L_b = local at the block's last row. The carry into
    // block b is E_{b−1} = Σ_{j≥1} m^{(j−1)·block} · L_{b−j} (every
    // carry-SOURCE block is full — only a key's LAST block can be
    // partial, and nothing follows it), truncated at the lag horizon:
    // the dropped tail is < m^{horizon·block} ≤ 1e−18 of the value
    // scale, below 1 ulp of the result. A bounded window of lags makes
    // the spine O(horizon) per block row — no per-key sequential fold,
    // no quadratic array building, hot keys included.
    val wS = Window.partitionBy(key: _*).orderBy(col("__blk").asc)
    val eprev = (1 to horizon)
      .map(j => pow(lit(m), lit((j - 1).toDouble * block)) *
        coalesce(lag(col("__L"), j).over(wS), lit(0.0)))
      .reduce(_ + _)
    val spine = local
      .groupBy((key :+ col("__blk")): _*)
      .agg(max_by(col("__local"), col("__rn")).as("__L"))
      .withColumn("__eprev", eprev)
      .drop("__L")

    // e_i = local_i + m^(jl+1) · E_{b−1}
    local
      .join(spine, keyCols :+ "__blk")
      .withColumn("ewma",
        col("__local") +
          pow(lit(m), col("__jl") + lit(1)) * col("__eprev"))
      .drop("__rn", "__blk", "__jl", "__c", "__u", "__local", "__eprev")
  }

  /** Skew-hardened [[ewma]] — the same answer, partitioned by (key,
    * TIME BUCKET) instead of key alone, so a hot key's ordered scan
    * spreads over its time buckets rather than landing in one straggler
    * window task (the [[AsofJoin.asofBucketed]] trick applied to the
    * recurrence; see the hot-key measurement in PLANS.md).
    *
    * Composition, exploiting that the recurrence is linear: run the
    * plain segmented scan WITHIN each (key, bucket) — each bucket folds
    * as if it opened the series (its first row enters as a seed, x, not
    * α·x) — then repair on a per-key bucket spine: switching the
    * opener's input to α·x and adding the carry shifts every row in the
    * bucket by `m^rn·(E_prev − x_first)` (rn = the row's 1-based
    * in-bucket position, the recurrence distance from the previous
    * bucket's last row), and the true bucket-final values fold as
    * `E_b = L_b + m^{sz_b}·(E_{b−1} − xf_b)`. Cross-bucket exponents are
    * POSITIVE (pure decay) — underflow to 0 is the mathematically-true
    * forgetting of a distant past.
    *
    * Bucket sizes vary, so the spine multiplier is not constant and the
    * plain form's lag-window shortcut doesn't apply; the spine folds
    * exactly instead, ONCE per key, over the per-key bucket list — whose
    * length is TIME-SPAN-bounded (span / bucket width), never row-count-
    * bounded, the same contract as asofBucketed's spine. Pick the width
    * so a key's bucket count stays in the thousands.
    *
    * `tsCol` must be a numeric epoch column consistent with
    * `orderCols`'s ordering; `bucket` is its width. Result is equal to
    * plain [[ewma]] for ANY bucket width (spec-pinned, empty buckets
    * included — the math counts rows, not time). */
  def ewmaBucketed(df: DataFrame, keyCols: Seq[String], tsCol: String,
      orderCols: Seq[Column], valueCol: String, alpha: Double,
      bucket: Long, block: Int = 32): DataFrame = {
    require(bucket >= 1,
      s"Recurrence.ewmaBucketed: bucket width must be >= 1, got $bucket")
    val m = 1.0 - alpha
    val key = keyCols.map(col)
    val withB = df.withColumn("__tb",
      floor(col(tsCol) / lit(bucket)).cast("long"))
    val keyB = keyCols :+ "__tb"

    val wIn = Window.partitionBy(keyB.map(col): _*).orderBy(orderCols: _*)
    // materialized like ewma's `local` (guide §5): `inb` feeds both the
    // bucket spine and the repair join
    val inb = Graphs.flatCheckpoint(
      ewma(withB, keyB, orderCols, valueCol, alpha, block)
        .withColumnRenamed("ewma", "__inb")
        .withColumn("__brn", row_number().over(wIn)))

    // per-key bucket spine: L_b = in-bucket ewma at the bucket's last
    // row, sz_b = its rows, xf_b = its first value; fold the true
    // bucket-final values (NULL E_{−1} encodes "no carry", coalescing
    // the first bucket's correction to 0) ONCE per key — `__es` is
    // computed in its own projection BEFORE the explode so the fold
    // runs once per key, not once per exploded row — then hand each
    // bucket its PREVIOUS bucket's E.
    val spine = inb
      .groupBy(keyB.map(col): _*)
      .agg(max_by(col("__inb"), col("__brn")).as("__L"),
        count(lit(1)).cast("int").as("__sz"),
        min_by(col(valueCol), col("__brn")).cast("double").as("__xf"))
      .groupBy(key: _*)
      .agg(sort_array(collect_list(struct(col("__tb"), col("__L"),
        col("__sz"), col("__xf")))).as("__bs"))
      .withColumn("__es", expr(
        s"""aggregate(__bs, array(cast(null as double)),
           |  (acc, b) -> acc || array(b.__L +
           |    power(${m}D, cast(b.__sz as double)) *
           |      coalesce(element_at(acc, -1) - b.__xf, 0.0D)))"""
          .stripMargin))
      .select((key :+
        posexplode(col("__bs")).as(Seq("__p", "__b")) :+
        col("__es")): _*)
      .select((key :+ col("__b.__tb").as("__tb") :+
        col("__b.__xf").as("__xf") :+
        element_at(col("__es"), col("__p") + lit(1)).as("__eprev")): _*)

    inb
      .join(spine, keyB)
      .withColumn("ewma",
        col("__inb") + pow(lit(m), col("__brn")) *
          coalesce(col("__eprev") - col("__xf"), lit(0.0)))
      .drop("__tb", "__inb", "__brn", "__eprev", "__xf")
  }
}
