package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming session windows (session_window + watermark) == batch gap
  * sessionization over the same data — the streaming counterpart of q52.
  * Timestamps are synthesized from event_id (1 tick = 1 second) since the
  * testdata's own ts column is unreadable nanos (see Tables). */
class StreamingSessionSpec extends AnyFunSuite with SparkTestBase {

  private val gap = "500 seconds"

  test("streamed session_window counts == batch session_window counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssession").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))

    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id")).orderBy(col("event_id")).collect()
    def jline(r: org.apache.spark.sql.Row): String =
      s"""{"user_id":${r.getLong(0)},"event_id":${r.getLong(1)}}"""
    // two micro-batches split mid-stream: open sessions must survive the
    // batch boundary and close only via watermark progress
    val (a, b) = events.splitAt(events.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/a.json"),
      a.map(jline).mkString("\n").getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
      b.map(jline).mkString("\n").getBytes)

    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_seconds(col("event_id")))

    val streamed = withTs(spark.readStream
      .schema("user_id LONG, event_id LONG").json(s"$dir/in"))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
    val q = streamed.writeStream.format("memory").queryName("ssession_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ssession_out")
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    val batch = withTs(spark.read
      .schema("user_id LONG, event_id LONG").json(s"$dir/in"))
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    assert(got === batch)
    assert(batch.exists(_._3 > 1)) // sessions actually merge events
  }
}
