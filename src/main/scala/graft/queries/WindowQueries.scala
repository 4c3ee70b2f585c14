package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.AlertPipeline

/** Reference-parity window queries (SURVEY §2.1 O4–O12) expressed over the
  * driver `events` table: per-user sliding 30-row count windows over `value`,
  * exactly the reference's countWindowAll(30, 1) semantics generalized to
  * many keys. Every query emits only full windows (rn ≥ 30) like the
  * reference's `fullWindowLoaded` gate (StreamingJob.java:139-142,367).
  *
  * Oracle note: both engines fold the same ascending-sorted list, so sums
  * match to the ulp; the driver's float compare covers the rest.
  */
object WindowQueries {
  private val N = AlertPipeline.WindowSize

  /** Shared DuckDB CTE: per-user row number + sorted trailing-30 list. */
  private val winCte: String =
    s"""WITH win AS (
       |  SELECT user_id, event_id,
       |    row_number() OVER ww AS rn,
       |    list_sort(list(value) OVER wf) AS xs
       |  FROM events
       |  WINDOW ww AS (PARTITION BY user_id ORDER BY event_id),
       |         wf AS (PARTITION BY user_id ORDER BY event_id
       |                ROWS BETWEEN ${N - 1} PRECEDING AND CURRENT ROW)
       |)""".stripMargin

  /** Shared windowed base (user_id, event_id, rn, xs) — one shuffle + one
    * per-window sort feeds all five array-measure queries (same
    * materialize-once pattern as the shingle and alert caches, registered
    * under the Caches lifecycle so evict(session) releases it like every
    * other shared frame). */
  private def windowedBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    Caches.frame(s, dir, "windowed") {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value").cast("double").as("v"))
      // m_mean materialized with xs: sm1/sm2 take the mean as a column so
      // it is never re-folded inside their per-element lambdas
      AlertPipeline.windowed(ev, col("user_id"), col("event_id"), col("v"), N)
        .select(col("user_id"), col("event_id"), col("xs"),
          graft.measures.Measures.mean(col("xs"), N).as("m_mean"))
    }

  private def winQ(name: String, sparkCol: org.apache.spark.sql.Column,
      duckExpr: String): Q =
    Q(name,
      (s, dir) => windowedBase(s, dir)
        .select(col("user_id"), col("event_id"), sparkCol),
      Some(
        s"""$winCte
           |SELECT user_id, event_id, $duckExpr
           |FROM win WHERE rn >= $N""".stripMargin))

  import graft.measures.Measures._

  val all: Seq[Q] = Seq(
    // O6: windowed mean (plain built-in window aggregate — no array needed).
    Q("q04_window_mean",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        ev.select(col("user_id"), col("event_id"),
            avg(col("value")).over(wOrd.rowsBetween(-(N - 1), 0)).as("wmean"),
            row_number().over(wOrd).as("rn"))
          .where(col("rn") >= N)
          .select(col("user_id"), col("event_id"), col("wmean"))
      },
      Some(
        s"""SELECT user_id, event_id, wmean FROM (
           |  SELECT user_id, event_id,
           |    avg(value) OVER (PARTITION BY user_id ORDER BY event_id
           |                     ROWS BETWEEN ${N - 1} PRECEDING AND CURRENT ROW) AS wmean,
           |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           |  FROM events
           |) t WHERE rn >= $N""".stripMargin)),

    // O7: median = (15th + 16th smallest)/2 (StreamingJob.java:189).
    winQ("q05_window_median",
      median(col("xs"), N).as("wmedian"),
      s"(xs[${N / 2}] + xs[${N / 2 + 1}]) / 2.0 AS wmedian"),

    // O8: 10th percentile = 4th smallest of 30 (SURVEY §2.5 Q3).
    winQ("q06_window_q10",
      q10(col("xs"), N).as("wq10"),
      s"xs[${N / 10 + 1}] AS wq10"),

    // O9: mean of the 3 smallest (StreamingJob.java:191-196).
    winQ("q07_window_tailmean",
      tailMean(col("xs"), N).as("wtail"),
      s"(xs[1] + xs[2] + xs[3]) / ${N / 10}.0 AS wtail"),

    // O10: mean-absolute-deviation risk measure (mean from the cached base).
    winQ("q08_window_sm1",
      sm1From(col("m_mean"), col("xs"), N).as("wsm1"),
      s"""list_avg(xs) -
         |    list_aggregate(list_transform(xs, x -> abs(list_avg(xs) - x)), 'sum')
         |      / ${2 * N}.0 AS wsm1""".stripMargin),

    // O11: Gini-mean-difference risk measure via the sorted identity
    // (DuckDB lambda index i is 1-based; Σᵢ(2i−n−1)sᵢ = half the pair sum).
    winQ("q09_window_sm2",
      sm2From(col("m_mean"), col("xs"), N).as("wsm2"),
      s"""list_avg(xs) -
         |    list_aggregate(list_transform(xs, (x,i) -> (2*i - ${N + 1}) * x), 'sum')
         |      / ${N * N}.0 AS wsm2""".stripMargin),

    // O12 + O5: the full alert pipeline — measures, population thresholds
    // (psd.R analog), unpivot, broadcast threshold join, shortfall predicate.
    Q("q10_alerts",
      (s, dir) => AnalyticsQueries.cachedAlerts(s, dir),
      Some(s"""$alertsWith
           |SELECT user_id, event_id, stat, m, thr FROM alerts""".stripMargin)),

    // O5 direct analog: the one-pass typed Aggregator (Flink
    // AggregateFunction ≙ Spark Aggregator) evaluated over the same window
    // frames — coverage proof for the custom-UDAF path. Excluded from bench:
    // a per-frame UDAF re-serializes its buffer per row, so the codegen'd
    // expression path (q05–q09) is the performance path by design.
    Q("q33_window_onepass_udaf",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value").cast("double").as("v"))
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        ev.withColumn("ms",
            graft.measures.WindowMeasuresAgg.column(col("v"), n = N)
              .over(wOrd.rowsBetween(-(N - 1), 0)))
          .withColumn("rn", row_number().over(wOrd))
          .where(col("rn") >= N)
          .select(col("user_id"), col("event_id"),
            col("ms.mean").as("m_mean"), col("ms.median").as("m_median"),
            col("ms.q10").as("m_q10"), col("ms.tailMean").as("m_tail"),
            col("ms.sm1").as("m_sm1"), col("ms.sm2").as("m_sm2"))
      },
      Some(
        s"""$winCte
           |SELECT user_id, event_id,
           |  list_avg(xs) AS m_mean,
           |  (xs[${N / 2}] + xs[${N / 2 + 1}]) / 2.0 AS m_median,
           |  xs[${N / 10 + 1}] AS m_q10,
           |  (xs[1] + xs[2] + xs[3]) / ${N / 10}.0 AS m_tail,
           |  list_avg(xs) - list_aggregate(list_transform(xs, x -> abs(list_avg(xs) - x)), 'sum') / ${2 * N}.0 AS m_sm1,
           |  list_avg(xs) - list_aggregate(list_transform(xs, (x,i) -> (2*i - ${N + 1}) * x), 'sum') / ${N * N}.0 AS m_sm2
           |FROM win WHERE rn >= $N""".stripMargin),
      bench = false)
  )

  /** The alert pipeline as a reusable DuckDB WITH-block ending in an
    * `alerts(user_id, event_id, stat, m, thr)` CTE — analytics oracles
    * (AnalyticsQueries) build on it. */
  lazy val alertsWith: String =
    s"""WITH ev AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v FROM events),
           |pop AS (
           |  SELECT count(*) AS n, avg(v) AS mean,
           |         quantile_cont(v, 0.5) AS median, quantile_cont(v, 0.1) AS q10
           |  FROM ev),
           |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS trn FROM ev),
           |tailt AS (SELECT avg(v) AS tail FROM ranked, pop WHERE trn <= pop.n // 10),
           |sm1t AS (SELECT avg(abs(v - pop.mean)) AS mad FROM ev, pop),
           |sm2t AS (SELECT sum((2*trn - pop.n - 1) * v) AS gsum FROM ranked, pop),
           |thr AS (
           |  SELECT 'mean' AS stat, mean AS thr FROM pop
           |  UNION ALL SELECT 'median', median FROM pop
           |  UNION ALL SELECT '10th quantile', q10 FROM pop
           |  UNION ALL SELECT 'mean of 10% smallest', tail FROM tailt
           |  UNION ALL SELECT 'security measure 1', mean - mad/2.0 FROM pop, sm1t
           |  UNION ALL SELECT 'security measure 2', mean - gsum/(pop.n * pop.n) FROM pop, sm2t),
           |win AS (
           |  SELECT user_id, event_id, row_number() OVER ww AS rn,
           |         list_sort(list(v) OVER wf) AS xs
           |  FROM ev
           |  WINDOW ww AS (PARTITION BY user_id ORDER BY event_id),
           |         wf AS (PARTITION BY user_id ORDER BY event_id
           |                ROWS BETWEEN ${N - 1} PRECEDING AND CURRENT ROW)),
           |meas AS (
           |  SELECT user_id, event_id,
           |    list_avg(xs) AS m_mean,
           |    (xs[${N / 2}] + xs[${N / 2 + 1}]) / 2.0 AS m_median,
           |    xs[${N / 10 + 1}] AS m_q10,
           |    (xs[1] + xs[2] + xs[3]) / ${N / 10}.0 AS m_tail,
           |    list_avg(xs) - list_aggregate(list_transform(xs, x -> abs(list_avg(xs) - x)), 'sum') / ${2 * N}.0 AS m_sm1,
           |    list_avg(xs) - list_aggregate(list_transform(xs, (x,i) -> (2*i - ${N + 1}) * x), 'sum') / ${N * N}.0 AS m_sm2
           |  FROM win WHERE rn >= $N),
           |unp AS (
           |  SELECT user_id, event_id, 'mean' AS stat, m_mean AS m FROM meas
           |  UNION ALL SELECT user_id, event_id, 'median', m_median FROM meas
           |  UNION ALL SELECT user_id, event_id, '10th quantile', m_q10 FROM meas
           |  UNION ALL SELECT user_id, event_id, 'mean of 10% smallest', m_tail FROM meas
           |  UNION ALL SELECT user_id, event_id, 'security measure 1', m_sm1 FROM meas
           |  UNION ALL SELECT user_id, event_id, 'security measure 2', m_sm2 FROM meas),
           |alerts AS (
           |  SELECT u.user_id, u.event_id, u.stat, u.m, t.thr
           |  FROM unp u JOIN thr t ON u.stat = t.stat
           |  WHERE u.m < t.thr AND (t.thr - u.m) / (1.0 + t.thr) >= 0.01)""".stripMargin
}
