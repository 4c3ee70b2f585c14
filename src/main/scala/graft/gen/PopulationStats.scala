package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.measures.Measures
import graft.sources.Sources

/** Population threshold job (≙ dataGeneration/psd.R:26-70, G2 in SURVEY
  * §2.3): for each of the 7 series (6 assets + weighted portfolio) over the
  * full sample table, compute the six statistics → the stats.csv-shaped
  * table (stat, assetNo, thr).
  *
  * Scale design: everything is per-group aggregation over (assetNo) — exact
  * percentiles and rank sums shuffle once on the series key; the rank-based
  * tail/GMD computations use the sorted-identity forms, O(n log n) per
  * group, no pairwise joins. Faithful to psd.R semantics:
  *   - quantile: R type-7 (== Spark `percentile` interpolation), computed
  *     from the rank table — never an exact-percentile aggregation buffer
  *     holding a whole series in one task;
  *   - tail: mean of exactly the ⌊n/10⌋ smallest (psd.R:46-50);
  *   - SM1: mean − Σ|mean−x|/(2n) (psd.R:52-62);
  *   - SM2 row: sjstats::gmd — the UNBIASED Gini mean difference
  *     2·Σᵢ(2i−n−1)sᵢ/(n(n−1)) (psd.R:64-68; SURVEY §2.5 Q5 keeps this
  *     as data, distinct from the window-side 2n² formula).
  */
object PopulationStats {

  /** samples: columns a0..a5 → (stat, assetNo, thr), 6×7 rows. */
  def thresholds(samples: DataFrame): DataFrame = {
    // cached: the series frame feeds the count/mean pass AND the rank
    // build, and `samples` may be a Gibbs generator output — without the
    // barrier every rescan replays the chains (the
    // AlertPipeline.populationThresholds precedent)
    val series = Sources.toSeries(samples.withColumn("seq", lit(0L)))
      .select(col("assetNo"), col("x")).cache()
    // per-series count/mean: one grouped pass. The quantiles do NOT use
    // exact percentile() here — its aggregation buffer holds a whole
    // series' value multiset in one task, the single-task collapse the
    // rank machinery below exists to avoid; both quantiles are derived
    // from the rank table instead (replicating Spark's interpolation
    // arithmetic exactly: position = p·(n−1), lower/higher bracketing,
    // lowerVal·(higher−position) + higherVal·(position−lower)).
    val base = series.groupBy(col("assetNo")).agg(
      count(lit(1)).as("n"),
      avg(col("x")).as("mean"))
    // distributed per-series ranks: global rank over (series, x) minus the
    // series' block offset — no single-task per-series sort
    // (graft.pipeline.Ranks scale note); cached: consumed by the offsets
    // aggregation and the join side (zipWithIndex already ran its own job)
    val granked = graft.pipeline.Ranks
      .withGlobalRank(series, Seq(col("assetNo"), col("x")), "grnk")
      .cache()
    val offsets = granked.groupBy(col("assetNo"))
      .agg(min(col("grnk")).as("g0"))
    val ranked = granked.join(broadcast(offsets), "assetNo")
      .withColumn("rnk", col("grnk") - col("g0") + 1)
      .join(broadcast(base), "assetNo")
    // rank-derived exact quantile (R type-7 == Spark percentile): the two
    // bracketing ranks contribute their interpolation weights; an integral
    // position contributes exactly its own row
    def quantile(p: Double): Column = {
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      sum(
        when(col("rnk") - 1 === lo && col("rnk") - 1 === hi, col("x"))
          .when(col("rnk") - 1 === lo, col("x") * (hi - pos))
          .when(col("rnk") - 1 === hi, col("x") * (pos - lo)))
    }
    val agg = ranked.groupBy(col("assetNo")).agg(
      first(col("n")).as("n"),
      first(col("mean")).as("mean"),
      quantile(0.5).as("median"),
      quantile(0.1).as("q10"),
      avg(when(col("rnk") <= (col("n") / lit(10)).cast("long"), col("x")))
        .as("tail"),
      avg(abs(col("x") - col("mean"))).as("mad"),
      sum((col("rnk") * 2 - col("n") - 1).cast("double") * col("x"))
        .as("gsum"))
    val out = agg.select(
      col("assetNo"),
      col("mean"),
      col("median"),
      col("q10"),
      col("tail"),
      (col("mean") - col("mad") / 2.0).as("sm1"),
      // n cast to double BEFORE the multiply: long n·(n−1) overflows past
      // n ≈ 3.04e9 — exactly the series sizes this module targets
      (lit(2.0) * col("gsum") /
        (col("n").cast("double") * (col("n") - 1).cast("double"))).as("gmd"))
    val rows = Seq(
      Measures.Mean -> "mean", Measures.Median -> "median",
      Measures.Q10 -> "q10", Measures.TailMean -> "tail",
      Measures.Sm1 -> "sm1", Measures.Sm2 -> "gmd")
    val result = rows.map { case (stat, c) =>
      out.select(lit(stat).as("stat"), col("assetNo"), col(c).as("thr"))
    }.reduce(_ unionAll _)
    // the 42-row result is about to be collected by every caller; eagerly
    // materialize it so the two barriers above can be released
    val collected = result.cache()
    collected.count()
    series.unpersist(blocking = false)
    granked.unpersist(blocking = false)
    collected
  }
}
