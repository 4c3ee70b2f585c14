package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streamed incremental dedup == batch dedupDelta on in-order arrival,
  * with the stream-static history join re-evaluated per micro-batch and
  * the first-arrival state persisting ACROSS micro-batches. */
class StreamingDeltaDedupSpec extends AnyFunSuite with SparkTestBase {

  test("streamed decisions == batch dedupDelta on in-order arrival; " +
      "state persists across batches; history is flagged statelessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def feed(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in/$name.json"),
        rows.map { case (d, t) => s"""{"doc_id":$d,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))

    val history = Seq((1L, "curated one"), (2L, "curated two"))
      .toDF("doc_id", "text")
    val histIdx = StreamingDeltaDedup.digests(history)

    // batch 1: a novel doc, a history dup (normalization variant), and a
    // novel doc that batch 2 will duplicate; batch 2: the cross-batch
    // copy (must drop via state), another history dup, a fresh novel doc
    val b1 = Seq((10L, "fresh alpha"), (11L, "Curated  One"),
      (12L, "fresh beta"))
    val b2 = Seq((20L, "fresh beta"), (21L, "curated two"),
      (22L, "fresh gamma"))
    feed("b1", b1)

    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val q = StreamingDeltaDedup
      .decisions(StreamingDeltaDedup.rows(stream, histIdx))
      .writeStream.format("memory").queryName("sdd_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      feed("b2", b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sdd_out")
      .select(col("docId"), col("inHistory"), col("keep")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(streamed.size === 6) // every arrival decided exactly once
    assert(streamed(10L) === ((false, true)))
    assert(streamed(11L) === ((true, false))) // normalization unifies
    assert(streamed(12L) === ((false, true)))
    assert(streamed(20L) === ((false, false))) // dropped via batch-1 state
    assert(streamed(21L) === ((true, false)))
    assert(streamed(22L) === ((false, true)))

    // batch truth over the same arrivals (arrival order == id order)
    val batch = graft.dedup.Dedup
      .dedupDelta(history, (b1 ++ b2).toDF("doc_id", "text"))
      .select(col("doc_id"), col("in_history"), col("keep")).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(streamed === batch)
  }
}
