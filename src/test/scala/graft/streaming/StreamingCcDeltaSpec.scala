package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Graphs

/** The streamed cluster-map fold must equal batch CC over the full edge
  * set HOWEVER the delta stream splits into micro-batches — including
  * the adversarial split where the edges that merge two components
  * arrive in DIFFERENT batches (the fold's associativity is the claim;
  * a single-batch run is the degenerate control). */
class StreamingCcDeltaSpec extends AnyFunSuite with SparkTestBase {

  test("multi-micro-batch fold == single-batch fold == batch CC, with " +
      "cross-batch component merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sccd").toString
    // history: {0,1}, {10,11}, {20,21}, isolated 30; delta edges chain
    // those components together ACROSS batches: (1,10) in one batch,
    // (11,20) in another, (21,30) in a third, plus new nodes 40-41
    val histEdges = Seq((0L, 1L), (10L, 11L), (20L, 21L))
    val allIds = (Seq(0L, 1L, 10L, 11L, 20L, 21L, 30L, 40L, 41L)).toDF("doc_id")
    val histIds = allIds.where(col("doc_id") < 40L)
    val deltaEdges = Seq((1L, 10L), (11L, 20L), (21L, 30L), (40L, 41L))
    // one parquet file per delta edge -> 4 micro-batches
    deltaEdges.toDF("doc_a", "doc_b").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/delta")
    assert(new java.io.File(s"$dir/delta").listFiles()
      .count(_.getName.endsWith(".parquet")) >= 2)

    val expected = Graphs.connectedComponents(allIds,
        (histEdges ++ deltaEdges).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
      20L -> 0L, 21L -> 0L, 30L -> 0L, 40L -> 40L, 41L -> 40L))

    // "compact" forces the merge-on-read COMPACTION path every batch
    // (bound 0: any accumulated remap folds into base immediately), so
    // both state shapes — remap-resident and base-resident — are pinned
    // to the same batch-CC ground truth
    for ((tag, maxFiles, bound) <- Seq(
        ("multi", Some("1"), StreamingCcDelta.DefaultCompactBound),
        ("compact", Some("1"), 0),
        ("single", None, StreamingCcDelta.DefaultCompactBound))) {
      val hist = Graphs.connectedComponents(histIds,
        histEdges.toDF("a", "b"))
      val src = spark.readStream.schema("doc_a BIGINT, doc_b BIGINT")
      maxFiles.foreach(m => src.option("maxFilesPerTrigger", m))
      val got = StreamingCcDelta.maintain(src.parquet(s"$dir/delta"),
          hist, allIds, s"$dir/_ckpt_$tag", compactBound = bound)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"$tag-batch fold drifted from batch CC")
    }
  }
}
