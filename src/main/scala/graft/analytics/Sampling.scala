package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — what a reproducible 100 TB pipeline uses
  * instead of `rand()`: the sample is a pure function of (id, salt), so
  * retried tasks, re-runs, and other engines select identical rows. */
object Sampling {

  /** Salted-digest priority of a row id — uniform on [0,1)-ish by hex
    * ordering; change `salt` to draw an independent sample. */
  def priority(idCol: org.apache.spark.sql.Column, salt: String) =
    md5(concat(idCol.cast("string"), lit(":" + salt)))

  /** The 52-bit dyadic uniform on [0,1): first 13 hex digits of the
    * salted digest over 16¹³ — exactly double-representable, so every
    * engine computing it from the same digest gets the same double. The
    * ONE definition all samplers share: its cross-engine exactness is
    * load-bearing for oracle parity, and a digit-count tweak must move
    * every consumer at once. */
  private def uniform01(id: org.apache.spark.sql.Column, salt: String) =
    conv(substring(priority(id, salt), 1, 13), 16, 10)
      .cast("long").cast("double") / math.pow(16, 13)

  private def uniform01(idCol: String, salt: String): org.apache.spark.sql.Column =
    uniform01(col(idCol), salt)

  /** The k rows per stratum with the smallest salted digest — a
    * deterministic stratified sample. Spark's rank-limit pushdown
    * (WindowGroupLimit) keeps at most k rows per stratum on the map side,
    * so the shuffle carries k rows per (partition, stratum). */
  def stratifiedPriority(df: DataFrame, strataCol: String, idCol: String,
      k: Int, salt: String = "s1"): DataFrame =
    df.withColumn("priority", priority(col(idCol), salt))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(col("priority"), col(idCol))))
      .where(col("__rk") <= k)
      .drop("__rk")

  /** Bernoulli-style deterministic sample: keep rows whose digest-derived
    * uniform falls below `rate` (approximately `rate` of all rows),
    * id-stable. The uniform uses 52 digest bits (the weightedPriority
    * dyadic), not a 16-bit bucket — a coarse bucket both floors the
    * granularity (any rate below 2⁻¹⁶ selects NOTHING) and truncates
    * small rates by up to a full bucket. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      salt: String = "s1"): DataFrame = {
    df.where(uniform01(idCol, salt) < rate)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    * each row draws the deterministic uniform `u` = first 13 hex digits
    * of its salted digest over 16¹³ (a dyadic rational — exactly
    * double-representable in both engines), and the sample is the top-`k`
    * rows by `key = ln(u)/weight` (monotone in u^(1/w), the A-ES
    * priority). Inclusion probability is proportional to weight, the
    * selection is a pure function of (id, salt, weight) — reproducible
    * across retries, re-runs, and engines — and the top-k plans as
    * TakeOrderedAndProject (per-partition heaps, driver merges k rows):
    * the 100 TB replacement for any sort-by-rand() scheme. Keys are
    * rounded to 6dp with an id tiebreak so both engines select the same
    * boundary rows; weights must be strictly positive. */
  def weightedPriority(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "s1"): DataFrame = {
    val u = uniform01(idCol, salt)
    // enforce the strictly-positive-weight contract per row: a negative
    // weight flips the key sign and would deterministically outrank every
    // valid row (ln(u)/w ≤ 0 for valid rows); a zero weight divides to
    // NULL and silently vanishes — both now fail loudly instead
    val key = when(col(weightCol) > 0, round(log(u) / col(weightCol), 6))
      .otherwise(raise_error(concat(
        lit("weightedPriority: weight must be strictly positive for id "),
        col(idCol).cast("string"))))
    df.withColumn("sample_key", key)
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic train/validation/test assignment: appends `splitCol`
    * with the label whose cumulative fraction bucket contains the row's
    * digest-derived uniform (the 52-bit dyadic of [[bernoulli]] — exactly
    * double-representable, so every engine computing it from the same
    * digest assigns the same row to the same split). A pure per-row map:
    * no shuffle, no state, stable under re-runs, retries, and corpus
    * growth (a document's split never changes when other documents are
    * added — the property a rand()-based splitter cannot give you).
    * `fractions` must be positive and sum to 1 (±1e-9); the last label
    * absorbs the u ≈ 1 boundary. */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], salt: String = "s1",
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitLabel(col(idCol), fractions, salt))

  /** [[hashSplit]]'s label as a standalone Column — because the split is
    * a pure function of (id, salt), ANY frame carrying a document id can
    * recompute membership in place: an audit over near-dup pairs labels
    * both endpoints with two projections instead of materializing and
    * joining the split table twice (q102's shape — at 100 TB that is two
    * shuffle-free column evaluations vs two corpus-sized hash joins). */
  def splitLabel(id: org.apache.spark.sql.Column,
      fractions: Seq[(String, Double)],
      salt: String = "s1"): org.apache.spark.sql.Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive, got $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    // NULL id guard: a NULL id makes the digest (hence u) NULL, every
    // `u < cut` is null-false, and the row would silently land in the
    // LAST split label — quietly contaminating the test split. Same
    // loud-failure contract as weightedPriority's weight guard.
    val u = when(id.isNotNull, uniform01(id, salt))
      .otherwise(raise_error(
        lit("splitLabel: NULL id — split assignment is undefined; " +
          "repair or pre-filter NULL ids")))
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.init.zip(cuts.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), cut), rest) =>
      when(u < cut, name).otherwise(rest)
    }
  }

  /** ADAPTIVE quality gate: a fixed global score cutoff over-prunes weak
    * sources and under-prunes strong ones, so real curation thresholds
    * per group (per source, per language) — drop each group's worst
    * `frac` fraction, judged against that group's OWN score
    * distribution. The threshold is the (floor(frac·n)+1)-th SMALLEST
    * score — an ORDER STATISTIC, not an interpolated quantile, so it is
    * an actual element of the group's multiset and the `score >= thr`
    * comparison is bit-exact in any engine that computed the same scores
    * (interpolation arithmetic, the one step q51 has to round away, never
    * happens). Exactly floor(frac·n) rows fall strictly below the
    * threshold; score ties AT the threshold all survive (deterministic,
    * order-independent).
    *
    * Returns the input rows with `thr` appended, KEEPING only rows at or
    * above their group's threshold. Scale shape: one per-group multiset
    * aggregation (the same per-group state bound as exact quantiles —
    * q51's documented trade; sketch-threshold via percentile_approx is
    * the loose-tolerance alternative) producing one (group, thr) row per
    * group, broadcast back. NULL scores fail loudly — a NULL would
    * silently vanish from both the threshold multiset and the gate. */
  def perGroupQuantileGate(df: DataFrame, groupCol: String,
      scoreCol: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac < 1.0, s"frac must be in [0,1), got $frac")
    val score = when(col(scoreCol).isNotNull, col(scoreCol))
      .otherwise(raise_error(concat(
        lit(s"perGroupQuantileGate: NULL $scoreCol in group "),
        col(groupCol).cast("string"))))
    val thrs = df
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(score)).as("__qs"),
        count(lit(1)).as("__n"))
      .select(col(groupCol),
        element_at(col("__qs"),
          least(col("__n"), floor(lit(frac) * col("__n")) + 1)
            .cast("int")).as("thr"))
    df.join(broadcast(thrs), groupCol)
      .where(col(scoreCol) >= col("thr"))
  }

  /** Temperature-scaled mixture weights (the multilingual/source
    * rebalancing rule used by every large-corpus sampling recipe, public
    * — e.g. the exponentially-smoothed sampling of multilingual BERT /
    * XLM-R, p_i ∝ size_i^α): one keyed aggregate for per-group sizes, a
    * 1-row broadcast for the normalizer, everything else per-group math
    * on a groups-sized frame. α = 1 reproduces proportional sampling,
    * α = 0 uniform; α ∈ (0, 1) lifts low-resource groups. Weights are
    * round-6 (pow differs across engines at ulp scale); `alloc_ppm` is
    * the integer parts-per-million allocation derived from the rounded
    * weight, stable by construction. */
  def temperatureWeights(df: DataFrame, groupCol: String, sizeCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(sizeCol)).as("__gs"))
      .withColumn("__p", pow(col("__gs").cast("double"), lit(alpha)))
    val z = totals.agg(sum(col("__p")).as("__z"))
    totals.crossJoin(broadcast(z))
      .select(col(groupCol), col("__gs").cast("long").as("group_size"),
        round(col("__p") / col("__z"), 6).as("weight"))
      .withColumn("alloc_ppm",
        round(col("weight") * lit(1000000d)).cast("long"))
  }
}
