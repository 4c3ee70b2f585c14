package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between corpus populations — the
  * data-quality gate a training pipeline runs between snapshots: has the
  * length/quality/source mix of what we're ingesting MOVED against the
  * curated reference? The standard score is the Population Stability
  * Index (the banking/ML-monitoring folklore metric):
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * with p the reference and q the current bin shares. Rule-of-thumb
  * reading (public convention): < 0.1 stable, 0.1–0.25 drifting, > 0.25
  * shifted enough to investigate before training on it.
  */
object Drift {

  /** Per-bin PSI decomposition between `ref` and `cur` over a
    * caller-computed integer bin column in [0, bins) — binning stays
    * with the caller because it is the domain contract (fixed-width,
    * quantile, categorical-coded all work; it must just be IDENTICAL for
    * both populations). Out-of-range bins fail LOUDLY per row rather
    * than silently distorting the shares.
    *
    * Shares are Laplace-smoothed over the FIXED domain — (n_b + 1) /
    * (N + bins) — so a bin empty on one side contributes a finite term
    * instead of ln(0), and the spine join guarantees every bin of the
    * domain appears exactly once (a drifted-IN bin is precisely the
    * signal).
    *
    * Returns one row per bin: (binCol, n_ref, n_cur, psi_term); the
    * headline PSI is `sum(psi_term)`. Scale shape: each population
    * reduces to ≤ `bins` (bin, count) rows via one integer keyed
    * aggregate — the corpus never shuffles anything wider — and the
    * spine/share arithmetic runs on bins-sized frames (the deliberate
    * empty-partitionBy windows below touch `bins` rows, not data). */
  def psi(ref: DataFrame, cur: DataFrame, binCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val spine = ref.sparkSession.range(bins).select(col("id").as(binCol))
    def shares(df: DataFrame, nCol: String, pCol: String): DataFrame = {
      // the loud-contract guard covers all three silent-distortion paths:
      // out-of-range, NULL (three-valued logic would otherwise park the
      // row under the NULL group and the spine join would drop it from
      // BOTH the bin counts and the denominator), and fractional values
      // (cast-to-long would silently truncate 3.7 into bin 3)
      val b = col(binCol)
      val guarded = df.select(
        when(b.isNull || b < 0 || b >= bins || b.cast("long") =!= b,
          raise_error(concat(
            lit(s"Drift.psi: $binCol must be an integer in [0, $bins), got "),
            coalesce(b.cast("string"), lit("NULL")))))
          .otherwise(b.cast("long")).as(binCol))
      val w = Window.partitionBy() // bins rows by construction
      spine
        .join(guarded.groupBy(col(binCol)).agg(count(lit(1)).as("__n")),
          Seq(binCol), "left")
        .withColumn(nCol, coalesce(col("__n"), lit(0L)))
        .withColumn(pCol, (col(nCol) + 1).cast("double") /
          (sum(col(nCol)).over(w) + lit(bins.toLong)))
        .select(col(binCol), col(nCol), col(pCol))
    }
    shares(ref, "n_ref", "__p").join(shares(cur, "n_cur", "__q"), binCol)
      .select(col(binCol), col("n_ref"), col("n_cur"),
        ((col("__p") - col("__q")) * log(col("__p") / col("__q")))
          .as("psi_term"))
  }
}
