package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names must match between the two (the driver sorts columns
  * by name before hashing values). */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** included in Bench headline timing */
    bench: Boolean = true)

object Tables {
  /** Contract: `Tables(_, _, "events")` always exposes `ts` as a BIGINT of
    * NANOS since the epoch, whatever the file's physical encoding. The
    * driver has shipped events.parquet with `ts` as both TIMESTAMP(NANOS)
    * (which Spark's reader rejects at schema conversion unless the legacy
    * nanos escape hatch maps it to a raw BIGINT — SPARK-40819) and plain
    * TIMESTAMP(MICROS). We read with the escape hatch on and NTZ inference
    * off, then branch on the type that actually materialized: a LongType
    * `ts` is already nanos; a TimestampType `ts` is converted via
    * `unix_micros * 1000` (tz-independent — unix_micros returns the stored
    * micros verbatim). Callers needing a wall-clock derive one with
    * `timestamp_micros(ts div 1000)` (see q62). */
  def ensureNanosConf(spark: SparkSession): Unit = {
    if (spark.conf.get(NanosConf._1, "false") != "true")
      spark.conf.set(NanosConf._1, NanosConf._2)
    // Micros-encoded files carry isAdjustedToUTC=false; with NTZ inference
    // on they'd surface as TIMESTAMP_NTZ, which has no tz-free path back to
    // an epoch long. Off, they read as TimestampType holding the file's raw
    // micros-since-epoch, which unix_micros recovers exactly.
    if (spark.conf.get(NtzConf._1, "true") != "false")
      spark.conf.set(NtzConf._1, NtzConf._2)
  }

  val NanosConf: (String, String) =
    ("spark.sql.legacy.parquet.nanosAsLong", "true")
  val NtzConf: (String, String) =
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw
        case _ =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.unix_micros(
              org.apache.spark.sql.functions.col("ts")
                .cast(org.apache.spark.sql.types.TimestampType)) *
              org.apache.spark.sql.functions.lit(1000L))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Table fanned out across the cluster, hash-sharded by `key`. The
    * testdata parquet files have a single row group, so a scan yields ONE
    * task and every map-heavy stage before the first shuffle runs serially;
    * this makes the fan-out explicit. Downstream groupBy/join on `key`
    * reuses the hash partitioning (ClusteredDistribution is satisfied), so
    * the shuffle is paid once. At real scale the source has many splits and
    * this shuffle is cheap relative to the per-row work it parallelizes. */
  def sharded(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame =
    apply(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col(key))
}

object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ WindowQueries.all ++ AnalyticsQueries.all ++
      ExtQueries.all ++ DedupQueries.all ++ AdvancedQueries.all ++
      CurationQueries.all ++ CorpusQueries.all ++ StreamingQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
