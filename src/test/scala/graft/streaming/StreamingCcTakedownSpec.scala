package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Graphs

/** The streamed takedown fold must equal batch retraction over the full
  * removal set HOWEVER the removals split into micro-batches — including
  * the adversarial split where the SAME component is touched in two
  * different batches (the second repair must resolve against the
  * already-repaired view, and edges to previously-removed nodes must
  * stay dead). Forced compaction (bound 0) pins the base-resident state
  * shape to the same ground truth. */
class StreamingCcTakedownSpec extends AnyFunSuite with SparkTestBase {

  test("multi-batch fold == single-batch == batch ccRetract == full " +
      "recompute, incl. same-component removals across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sctd").toString
    // chain 0-1-2-3 (remove 1 then 2 in DIFFERENT batches: split, then
    // shrink); triangle {10,11,12} (remove canonical 10: handoff);
    // pair {20,21} fully removed across the two batches (vanish);
    // {30,31} and isolated 40 untouched
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L), (30L, 31L))
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 30L, 31L, 40L)
      .toDF("doc_id")
    val labels = Graphs.connectedComponents(ids, edges.toDF("a", "b"))
      .localCheckpoint()
    val removals = Seq(Seq(1L, 10L, 20L), Seq(2L, 21L))
    removals.zipWithIndex.foreach { case (batch, i) =>
      batch.toDF("doc_id").repartition(1)
        .write.mode("append").parquet(s"$dir/in")
      val _ = i
    }
    val expected = Map(0L -> 0L, 3L -> 3L, 11L -> 11L, 12L -> 11L,
      30L -> 30L, 31L -> 30L, 40L -> 40L)
    val keep = expected.keySet
    val full = Graphs.connectedComponents(
        ids.where(col("doc_id").isin(keep.toSeq: _*)),
        edges.filter(e => keep(e._1) && keep(e._2)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === expected)
    val batchRetract = Graphs.ccRetract(labels, edges.toDF("a", "b"),
        removals.flatten.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchRetract === expected)

    for ((tag, maxFiles, bound) <- Seq(("multi", Some("1"), 100000),
        ("compact", Some("1"), 0), ("single", None, 100000))) {
      val src = spark.readStream.schema("doc_id BIGINT")
      maxFiles.foreach(m => src.option("maxFilesPerTrigger", m))
      val got = StreamingCcTakedown.maintain(src.parquet(s"$dir/in"),
          labels, edges.toDF("a", "b"), s"$dir/_ckpt_$tag",
          compactBound = bound)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"$tag-batch takedown drifted")
    }
  }
}
