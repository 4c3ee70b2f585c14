package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-level hash bucketing — the lakehouse idiom that ELIMINATES the
  * join shuffle instead of optimizing it. Two tables written with the same
  * bucket count on their join keys are co-partitioned ON DISK: a join
  * between them needs no Exchange on either side (BucketingSpec pins a
  * zero-Exchange sort-merge join at runtime), and a groupBy on the bucket
  * key needs no shuffle at all. At 100 TB this converts the fact⋈fact
  * join — the single most expensive shuffle in a star-schema workload,
  * paid on EVERY query — into a one-time layout cost paid at ingest.
  *
  * Spark specifics this module encodes:
  *  - tables are EXTERNAL (explicit `path`), so the warehouse dir never
  *    accumulates managed state across verify/bench runs;
  *  - the frame is repartitioned by the bucket key before the write, so
  *    each task holds whole buckets and the file count stays O(buckets),
  *    not O(tasks × buckets) — the small-file failure mode of naive
  *    bucketed writes at scale;
  *  - `sortBy` the same key, so bucket files are internally ordered and a
  *    sort-merge join can stream them (and min/max stats tighten).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table named
    * `table` at `path`, replacing any prior registration. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** The co-located equi-join of two same-bucket-count tables: plain
    * DataFrame join — Catalyst reads the catalog bucketing and drops both
    * Exchanges on its own; nothing to hand-schedule. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
