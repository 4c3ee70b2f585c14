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
    val u = conv(substring(priority(col(idCol), salt), 1, 13), 16, 10)
      .cast("long").cast("double") / math.pow(16, 13)
    df.where(u < rate)
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
    val u = conv(substring(priority(col(idCol), salt), 1, 13), 16, 10)
      .cast("long").cast("double") / math.pow(16, 13)
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
}
