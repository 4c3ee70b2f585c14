package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The mixed add/remove index fold must equal "keep-first index rebuilt
  * over (history ∪ added docs) ∖ removed docs" HOWEVER the ops split
  * into micro-batches — keeper handoff, vanish, re-add-after-vanish,
  * no-resurrection, same-batch add+rm, plus randomized schedules. Doc
  * grain with synthetic digests (the passage grain differs only in the
  * caller's mkMembers — q217 gates it on the real corpus). */
class StreamingIndexMaintSpec extends AnyFunSuite with SparkTestBase {

  // members: digest = the doc's text; orderCols = (doc_id)
  private def mkMembers(df: DataFrame): DataFrame =
    df.select(col("text").as("k"), col("doc_id"))

  private def ground(docs: Seq[(Long, String)], removed: Set[Long])
      : Map[String, (Long, Long)] = {
    val retained = docs.filterNot(d => removed(d._1))
    retained.groupBy(_._2).map { case (k, ms) =>
      k -> (ms.map(_._1).min, ms.size.toLong)
    }
  }

  private def runMixed(dir: String, tag: String,
      hist: Seq[(Long, String)], batches: Seq[Seq[(String, Long, String)]],
      bound: Int, maxFiles: Option[String] = Some("1"),
      persist: Boolean = false): Map[String, (Long, Long)] = {
    import spark.implicits._
    val histM = hist.toDF("doc_id", "text")
      .select(col("text").as("k"), col("doc_id"))
    val index = histM.groupBy(col("k"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
    batches.foreach { b =>
      b.toDF("op", "doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$dir/in_$tag")
    }
    val src = spark.readStream
      .schema("op STRING, doc_id BIGINT, text STRING")
    maxFiles.foreach(m => src.option("maxFilesPerTrigger", m))
    StreamingIndexMaint.maintain(src.parquet(s"$dir/in_$tag"), index,
        histM, s"$dir/_ckpt_$tag", keyCol = "k", docCol = "doc_id",
        orderCols = Seq("doc_id"), mkMembers = mkMembers,
        compactBound = bound,
        persistDir = if (persist) Some(s"$dir/_state_$tag") else None)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("planted shapes: keeper handoff, vanish, re-add-after-vanish, " +
      "no-resurrection, same-batch add+rm") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sim").toString
    // history: digest A = {1, 2}; B = {3}; C = {4}
    val hist = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
    // b1: rm 1 (A's keeper hands off to 2) + add 10 (new digest D)
    // b2: rm 3 (B vanishes) + rm 4 and add 11 of digest C in the SAME
    //     batch (C's only member leaves, the new arrival re-elects)
    // b3: add 12 with digest B (B lives again — re-add after vanish);
    //     add 13 re-using REMOVED doc 3's id? No — add a copy to A
    //     (n_occ grows under the recovered keeper)
    // b4: add 14 with doc id 4 — 4 was removed: NO RESURRECTION, the
    //     row is dropped even though the digest (C) is alive
    val batches = Seq(
      Seq(("add", 10L, "D"), ("rm", 1L, "")),
      Seq(("rm", 3L, ""), ("rm", 4L, ""), ("add", 11L, "C")),
      Seq(("add", 12L, "B"), ("add", 13L, "A")),
      Seq(("add", 4L, "C")))
    val allDocs = hist ++ Seq((10L, "D"), (11L, "C"), (12L, "B"),
      (13L, "A"), (4L, "C"))
    val expected = ground(allDocs.distinct, Set(1L, 3L, 4L))
    assert(expected === Map("A" -> (2L, 2L), "B" -> (12L, 1L),
      "C" -> (11L, 1L), "D" -> (10L, 1L)))
    for ((tag, bound) <- Seq(("multi", 10000), ("compact", 0))) {
      val got = runMixed(dir, tag, hist, batches, bound)
      assert(got === expected, s"$tag drifted from ground truth")
    }
    val gotSingle = runMixed(dir, "single", hist,
      Seq(batches.flatten), 10000, maxFiles = None)
    assert(gotSingle === expected, "single-batch drifted")
  }

  test("randomized mixed schedules equal the batch rebuild") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_simr$trial").toString
      val digests = Vector("A", "B", "C", "D", "E", "F")
      val hist = (0L until 20L).map(i => (i, digests(rnd.nextInt(6))))
      val adds = (100L until 115L).map(i => (i, digests(rnd.nextInt(6))))
      val removedSeq = rnd.shuffle(hist.map(_._1) ++ adds.map(_._1))
        .take(8)
      val ops = rnd.shuffle(
        adds.map(d => ("add", d._1, d._2)) ++
          removedSeq.map(id => ("rm", id, "")))
      val batches = ops.grouped((ops.size + 3) / 4).toSeq
      val expected = ground(hist ++ adds, removedSeq.toSet)
      val got = runMixed(dir, "r", hist, batches,
        if (trial == 2) 0 else 10000, persist = trial == 3)
      assert(got === expected, s"trial $trial")
    }
  }

  test("the member layer is O(1) frames in batch count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_simf").toString
    val hist = Seq((0L, "A"))
    val histM = hist.toDF("doc_id", "text")
      .select(col("text").as("k"), col("doc_id"))
    val index = histM.groupBy(col("k"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
    val nb = 4 * StreamingCcMixed.EdgeFrameCap
    val batches = (1 to nb).map(i =>
      Seq(("add", 100L + i, if (i % 2 == 0) "A" else s"X$i")))
    batches.foreach { b =>
      b.toDF("op", "doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$dir/in")
    }
    val state = StreamingIndexMaint.maintainState(
      spark.readStream.schema("op STRING, doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
      index, histM, s"$dir/_ckpt", "k", "doc_id", Seq("doc_id"),
      mkMembers, 1000000, None)
    assert(state.memberFrameCount <= StreamingCcMixed.EdgeFrameCap + 1,
      s"member layer grew to ${state.memberFrameCount} frames over " +
        s"$nb batches")
    val got = state.read.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = ground(hist ++ batches.flatten.map(o => (o._2, o._3)),
      Set.empty)
    assert(got === expected)
  }
}
