package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.AlertPipeline

class StreamingEventAlertsSpec extends AnyFunSuite with SparkTestBase {

  test("streamed event alerts equal the batch pipeline row-for-row (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.queries.Tables(spark, dir, "events")
    val thr = StreamingEventAlerts.thresholds(batchEvents)

    val stream = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(StreamingEventAlerts.stagedEventsDir(dir))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sea_t").toString
    val q = StreamingEventAlerts.alerts(stream, thr).writeStream
      .format("memory").queryName("sea_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sea_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
        r.getDouble(3)).toMap
    val batch = AlertPipeline.eventAlerts(batchEvents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
        r.getDouble(3)).toMap
    assert(streamed.size === batch.size)
    assert(streamed.size > 0)
    batch.foreach { case (k, v) =>
      assert(streamed.contains(k), s"missing alert $k in stream")
      assert(math.abs(streamed(k) - v) < 1e-9, s"value mismatch at $k")
    }
  }
}
