package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.AlertPipeline

class CountSlidingWindowSpec extends AnyFunSuite with SparkTestBase {

  private def samples(keys: Int, n: Int): Seq[Sample] = {
    val rnd = new scala.util.Random(99)
    for (k <- 0 until keys; i <- 0 until n)
      yield Sample(k.toLong, i.toLong, rnd.nextDouble() * 2 - 1)
  }

  test("streaming measures == batch measures, state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = samples(keys = 2, n = 45)
    val input = MemoryStream[Sample]
    val q = CountSlidingWindow.measures(input.toDS(), 30)
      .writeStream.format("memory").queryName("m_out")
      .outputMode("append").start()
    try {
      // three micro-batches straddling the window-full boundary
      input.addData(data.filter(_.seq < 20))
      q.processAllAvailable()
      input.addData(data.filter(s => s.seq >= 20 && s.seq < 35))
      q.processAllAvailable()
      input.addData(data.filter(_.seq >= 35))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("m_out").as[MeasureRow].collect()
      .map(r => (r.key, r.seq, r.stat) -> r.m).toMap

    // batch reference over the same data
    val df = data.toDF("key", "seq", "v")
    val batch = AlertPipeline.withMeasures(
      AlertPipeline.windowed(df, col("key"), col("seq"), col("v")),
      Seq(col("key"), col("seq"))).collect()
    assert(batch.length * 6 === got.size)
    assert(got.size === 2 * (45 - 29) * 6)
    batch.foreach { r =>
      graft.measures.Measures.names.zipWithIndex.foreach { case (stat, i) =>
        val exp = r.getDouble(2 + i)
        val g = got((r.getLong(0), r.getLong(1), stat))
        assert(math.abs(g - exp) < 1e-9, s"key ${r.getLong(0)} seq ${r.getLong(1)} $stat")
      }
    }
  }

  test("replayed and late rows are skipped, not double-applied") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = samples(keys = 1, n = 35)
    val input = MemoryStream[Sample]
    val q = CountSlidingWindow.measures(input.toDS(), 30)
      .writeStream.format("memory").queryName("r_out")
      .outputMode("append").start()
    try {
      input.addData(data)
      q.processAllAvailable()
      // a replayed slice AND a late row: all at or below lastSeq → no-ops
      input.addData(data.slice(10, 20) :+ Sample(0L, 5L, 99.9))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("r_out").as[MeasureRow].collect()
    // only the original fires (seq 29..34), nothing from the replay batch
    assert(rows.length === (35 - 29) * 6)
    assert(rows.map(_.seq).distinct.sorted.toSeq === (29L to 34L))
  }

  test("ring-buffer state holds at n=1000: semantics across micro-batches") {
    // The large-window shape check: state update must be O(1) per row (a
    // ring-buffer slot write, never a window copy), so a 1000-deep window
    // over 3000 rows streams through in fire-cost time. Semantics pinned
    // against a naive sliding recompute with the same measure code.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = 1000
    val data = samples(keys = 1, n = 3000)
    val input = MemoryStream[Sample]
    val q = CountSlidingWindow.measures(input.toDS(), n)
      .writeStream.format("memory").queryName("big_out")
      .outputMode("append").start()
    try {
      // two micro-batches straddling the window-full boundary
      input.addData(data.filter(_.seq < 1500))
      q.processAllAvailable()
      input.addData(data.filter(_.seq >= 1500))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("big_out").as[MeasureRow].collect()
      .map(r => (r.seq, r.stat) -> r.m).toMap
    assert(got.size === (3000 - (n - 1)) * 6)
    val vs = data.map(_.v).toArray
    // spot-check every 100th window end against the naive trailing slice
    (n - 1 until 3000 by 100).foreach { end =>
      val expect = graft.measures.MeasuresRef.all(
        vs.slice(end - n + 1, end + 1))
      expect.foreach { case (stat, m) =>
        assert(math.abs(got((end.toLong, stat)) - m) < 1e-9,
          s"seq $end $stat")
      }
    }
  }

  test("alerts start exactly at row 30 and respect thresholds") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = samples(keys = 1, n = 32)
    // thresholds far above any window mean -> every full window alerts on mean
    val thr = Map("mean" -> 1e6)
    val input = MemoryStream[Sample]
    val q = CountSlidingWindow.alerts(input.toDS(), thr, 30)
      .writeStream.format("memory").queryName("a_out")
      .outputMode("append").start()
    try {
      input.addData(data)
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.table("a_out").as[StreamAlert].collect()
    assert(alerts.map(_.seq).min === 29L)
    assert(alerts.length === 3) // seq 29,30,31 — mean only
    assert(alerts.forall(_.stat == "mean"))
  }
}
