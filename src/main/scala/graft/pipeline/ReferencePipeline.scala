package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.measures.Measures
import graft.sources.Sources

/** The complete reference workload end-to-end (SURVEY §3.1): samples CSV +
  * stats.csv → alert table. This is the exact analog of StreamingJob.main,
  * re-expressed declaratively:
  *
  *   readTextFile → Splitter        ⇒ Sources.readSamplesCsv (drop-malformed)
  *   getOverallValue (7th series)   ⇒ Sources.toSeries (unpivot 7 series)
  *   countWindowAll(30,1)+aggregate ⇒ AlertPipeline.windowed per assetNo
  *   State.getAlerts + AlertReducer ⇒ unpivot measures → broadcast threshold
  *                                    join → shortfall predicate
  *
  * Output: (windowId, stat, assetNo, value) — windowId is the 1-based seq of
  * the window's last row (≥ 30), replacing the reference's constant `count`
  * field (SURVEY §2.5 Q7). The 7 series evaluate in parallel (partitioned by
  * assetNo); within a series the window order is the file order.
  */
object ReferencePipeline {

  def csvAlerts(spark: SparkSession, samplesPath: String, statsPath: String,
      n: Int = AlertPipeline.WindowSize,
      shortfall: Double = AlertPipeline.Shortfall): DataFrame = {
    val samples = Sources.readSamplesCsv(spark, samplesPath)
    val thresholds = Sources.readStatsCsv(spark, statsPath)
    alerts(samples, thresholds, n, shortfall)
  }

  def alerts(samples: DataFrame, thresholds: DataFrame, n: Int,
      shortfall: Double): DataFrame = {
    val series = Sources.toSeries(samples)
    val meas = AlertPipeline.withMeasures(
      AlertPipeline.windowed(series, col("assetNo"), col("seq"), col("x"), n),
      Seq(col("assetNo"), col("seq")), n)
    meas
      .select(col("assetNo"), col("seq"), expr(AlertPipeline.unpivotMeasures))
      .join(broadcast(thresholds), Seq("stat", "assetNo"))
      .where(Measures.alertPredicate(col("m"), col("thr"), shortfall))
      .select(col("seq").as("windowId"), col("stat"), col("assetNo"),
        col("m").as("value"))
  }
}
