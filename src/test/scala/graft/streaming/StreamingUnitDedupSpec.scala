package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streamed keep-first unit dedup == batch dedupUnits when units arrive
  * in (doc, idx) order, with the keep state persisting across
  * micro-batches (a unit first seen in batch 1 must mark its batch-2
  * copies as drops). */
class StreamingUnitDedupSpec extends AnyFunSuite with SparkTestBase {

  test("streamed decisions == batch keep-first on in-order arrival") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sud").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def feed(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in/$name.json"),
        rows.map { case (d, i, u) =>
          s"""{"doc_id":$d,"unit_idx":$i,"unit":"${esc(u)}"}"""
        }.mkString("\n").getBytes("UTF-8"))
    }
    // batch 1: docs 1-2; batch 2: docs 3-4 — cross-batch duplicates:
    // "alpha beta" recurs in batch 2 (must be dropped there), and a
    // case/whitespace variant recurs too (normalization must unify)
    val b1 = Seq((1L, 0L, "alpha beta"), (1L, 1L, "gamma delta"),
      (2L, 0L, "epsilon zeta"), (2L, 1L, "alpha beta"))
    val b2 = Seq((3L, 0L, "  ALPHA   beta "), (3L, 1L, "eta theta"),
      (4L, 0L, "gamma delta"), (4L, 1L, "iota kappa"))
    feed("b1", b1)

    val stream = spark.readStream
      .schema("doc_id LONG, unit_idx LONG, unit STRING").json(s"$dir/in")
    val q = StreamingUnitDedup
      .decisions(StreamingUnitDedup.unitRows(stream))
      .writeStream.format("memory").queryName("sud_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      feed("b2", b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sud_out")
      .select(col("docId"), col("idx"), col("keep")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(streamed.size === 8) // every occurrence decided exactly once

    // batch truth over the same files (arrival order == (doc, idx) order)
    val batch = graft.dedup.Dedup.dedupUnits(
      spark.read.schema("doc_id LONG, unit_idx LONG, unit STRING")
        .json(s"$dir/in"))
      .select(col("doc_id"), col("unit_idx"), col("keep")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(streamed === batch)
    // and the cross-batch drops actually happened
    assert(streamed((2L, 1L)) === false) // within batch 1
    assert(streamed((3L, 0L)) === false) // variant across batches
    assert(streamed((4L, 0L)) === false) // exact copy across batches
    assert(streamed((1L, 0L)) && streamed((1L, 1L)))
  }
}
