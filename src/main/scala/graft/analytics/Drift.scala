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

  /** PSI between two populations over a CATEGORICAL column — the
    * convenience [[psi]]'s integer-bin contract left to callers, for
    * THE drift columns a corpus team actually watches (source mix,
    * langid mix; the r15 verdict's carried-over gap). The category
    * dictionary is the UNION of both populations' distinct values —
    * sorted, so bin ids are deterministic — which is exactly what makes
    * the UNSEEN-category path work: a category present on only one side
    * (drifted IN or OUT) still gets a spine slot and a finite
    * Laplace-smoothed term instead of vanishing from the score
    * (DriftSpec pins it).
    *
    * The dictionary is driver-collected under a loud `maxCategories`
    * cap — a categorical drift column has dozens of values; a
    * million-value column is an identifier, not a category, and coding
    * it would build a degenerate million-bin spine (the bounded-collect
    * class, guarded). NULL fails loudly like [[psi]] — coalesce a
    * sentinel first if NULL is a legitimate category. A single-category
    * union domain is rejected: its PSI is identically zero and the
    * column is constant — a caller bug, not a drift reading.
    *
    * Returns one row per category: (catCol, n_ref, n_cur, psi_term);
    * headline PSI = `sum(psi_term)`. Scale shape: each population
    * reduces to ≤ |dict| rows via one keyed aggregate; the dictionary
    * join broadcasts. */
  def psiCategorical(ref: DataFrame, cur: DataFrame, catCol: String,
      maxCategories: Int = 10000): DataFrame = {
    val c = col(catCol)
    def guarded(df: DataFrame): DataFrame = df.select(
      when(c.isNull, raise_error(lit(
        s"Drift.psiCategorical: NULL $catCol — coalesce a sentinel " +
          "category first if NULL is legitimate"))).otherwise(c)
        .as(catCol))
    val dict = guarded(ref).unionAll(guarded(cur)).distinct()
      .orderBy(col(catCol)).limit(maxCategories + 1)
      .collect().map(_.get(0))
    require(dict.length <= maxCategories,
      s"Drift.psiCategorical: $catCol has more than $maxCategories " +
        "distinct values — that is an identifier, not a categorical " +
        "drift column; raise maxCategories only if the domain is " +
        "genuinely that wide")
    require(dict.length >= 2,
      s"Drift.psiCategorical: $catCol is constant across both " +
        "populations — a single-category PSI is identically zero and " +
        "almost certainly a caller bug")
    val spark = ref.sparkSession
    val dictDf = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(dict.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(v, i.toLong) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types
          .StructField(catCol, ref.schema(catCol).dataType),
        org.apache.spark.sql.types.StructField("__bin",
          org.apache.spark.sql.types.LongType)))))
    def coded(df: DataFrame): DataFrame =
      guarded(df).join(dictDf, catCol).select(col("__bin"))
    psi(coded(ref), coded(cur), "__bin", dict.length)
      .join(dictDf, "__bin")
      .select(col(catCol), col("n_ref"), col("n_cur"), col("psi_term"))
  }
}
