package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Watermarked event-time tumbling windows on the REAL events clock (the
  * parquet nanos column via Tables), streamed in two out-of-order file
  * batches — equals the batch aggregation over the same rows. The batch
  * analog is q62. */
class StreamingEventTimeSpec extends AnyFunSuite with SparkTestBase {

  test("streamed hourly windows on real ts == batch, across micro-batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_setime").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))

    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), col("ts")).collect()
    def jline(r: org.apache.spark.sql.Row): String =
      s"""{"event_type":"${r.getString(0)}","ts":${r.getLong(1)}}"""
    // split by hash, not time: both batches carry every hour's data, so
    // windows must stay open across the micro-batch boundary
    val (a, b) = events.partition(r => r.getLong(1) % 2 == 0)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/a.json"),
      a.map(jline).mkString("\n").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
      b.map(jline).mkString("\n").getBytes)

    def hourly(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", "1 hour")
      .groupBy(col("event_type"), window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))

    val q = hourly(spark.readStream.schema("event_type STRING, ts LONG")
      .json(s"$dir/in"))
      .writeStream.format("memory").queryName("setime_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("window.start").as("s"), col("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet

    val got = toSet(spark.table("setime_out"))
    val batch = toSet(hourly(
      spark.read.schema("event_type STRING, ts LONG").json(s"$dir/in")))
    assert(got === batch)
    assert(got.nonEmpty && got.exists(_._3 > 1))
  }
}
