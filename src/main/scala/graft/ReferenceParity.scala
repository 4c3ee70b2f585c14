package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.Generator
import graft.pipeline.ReferencePipeline

/** Reference-parity drive: generate truncated-MVT samples with the engine's
  * Gibbs sampler (≙ psd.R), run the full CSV alert pipeline against the
  * reference's own committed stats.csv thresholds, and print per-measure
  * alert rates next to the rates implied by the reference's recorded run
  * (postProcessing/countings.txt over 999,971 windows).
  *
  * Usage: runMain graft.ReferenceParity [nSamples]
  */
object ReferenceParity {
  // per-asset alert rate from countings.txt (count / 999,971 windows / 6
  // assets) and portfolio rate, per measure
  private val expectedAssetRate = Map(
    "mean" -> 0.1720, "median" -> 0.2856, "10th quantile" -> 0.0768,
    "mean of 10% smallest" -> 0.0019, "security measure 1" -> 0.1729,
    "security measure 2" -> 0.0000)
  private val expectedPortfolioRate = Map(
    "mean" -> 0.0112, "median" -> 0.0348, "10th quantile" -> 0.0423,
    "mean of 10% smallest" -> 0.0696, "security measure 1" -> 0.0134,
    "security measure 2" -> 0.0000)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val statsCsv = "/root/reference/dataGeneration/stats.csv"
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-reference-parity")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_parity")
    val samplesPath = s"$dir/samples.csv"
    val lines = Generator.sample(spark, n, partitions = 8, seed = 42)
      .collect() // n ≤ ~1e6 rows of 6 doubles — fits; avoids csv writer quirks
      .map(r => (0 until 6).map(r.getDouble).mkString(","))
    java.nio.file.Files.write(java.nio.file.Paths.get(samplesPath),
      String.join("\n", lines: _*).getBytes)

    // cached: the rates aggregation and the total count are two actions
    // over the same end-to-end pipeline (CSV parse → global numbering →
    // unpivot → 30-row windows) — uncached it would all run twice
    val alerts = ReferencePipeline.csvAlerts(spark, samplesPath, statsCsv)
      .cache()
    val windows = (n - 29).toDouble
    val rates = alerts
      .groupBy(col("stat"))
      .agg(
        (count(when(col("assetNo") < 6, 1)) / (windows * 6)).as("asset_rate"),
        (count(when(col("assetNo") === 6, 1)) / windows).as("portfolio_rate"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    println(f"[parity] n=$n windows=${windows.toLong} " +
      f"total_alerts=${alerts.count()}")
    graft.measures.Measures.names.foreach { s =>
      val (ga, gp) = rates.getOrElse(s, (0.0, 0.0))
      println(f"[parity] ${s}%-22s asset_rate=$ga%.4f (ref ${expectedAssetRate(s)}%.4f)  " +
        f"portfolio_rate=$gp%.4f (ref ${expectedPortfolioRate(s)}%.4f)")
    }
    spark.stop()
  }
}
