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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright at schema conversion — UNLESS the legacy nanos escape hatch
    * is on, which maps the column to a plain BIGINT of nanos since epoch
    * (SPARK-40819). Events therefore reads with that conf plus an explicit
    * schema declaring `ts BIGINT`; callers needing a timestamp derive one
    * with `timestamp_micros(ts div 1000)` (see q62). */
  private val eventsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Sessions we construct set this at build time (see Verify/Bench/
    * SparkTestBase); there is no per-read parquet option for it in Spark
    * 4.1, so for externally-constructed sessions (the driver's) this is an
    * idempotent fallback — it writes a constant, so concurrent first reads
    * race benignly, and it only affects files that actually contain
    * TIMESTAMP(NANOS) columns (events.parquet is the only one). */
  def ensureNanosConf(spark: SparkSession): Unit =
    if (spark.conf.get(NanosConf._1, "false") != "true")
      spark.conf.set(NanosConf._1, NanosConf._2)

  val NanosConf: (String, String) =
    ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      ensureNanosConf(spark)
      spark.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
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
      CurationQueries.all ++ StreamingQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
