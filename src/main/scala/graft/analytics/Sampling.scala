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

  /** Bernoulli-style deterministic sample: keep rows whose digest starts
    * below `rate` (approximately `rate` of all rows), id-stable. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double,
      salt: String = "s1"): DataFrame = {
    // first 4 hex digits as an integer in [0, 65536)
    val bucket = conv(substring(priority(col(idCol), salt), 1, 4), 16, 10)
      .cast("long")
    df.where(bucket < (rate * 65536).toLong)
  }
}
