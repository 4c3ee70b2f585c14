package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.similarity.Similarity

/** The mixed add/remove posting fold must equal "assignCells over
  * (history ∪ added vectors) ∖ removed ids" HOWEVER the ops split into
  * micro-batches — removal wins same-batch add+rm, takedown is
  * permanent (no resurrection), both compaction regimes, and the
  * standing layer stays O(1) frames in batch count. Synthetic dim-2
  * vectors against planted centroids (assignment itself is
  * Similarity's, gated elsewhere — q221 gates the real corpus). */
class StreamingIvfMixedSpec extends AnyFunSuite with SparkTestBase {

  private val cents: Array[(Int, Array[Double])] =
    Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))

  private def mkPostings(df: DataFrame): DataFrame =
    Similarity.assignCells(df, cents).select(col("vec_id"),
      col("cell"), col("e"))

  /** Batch ground truth: the retained rebuild. */
  private def ground(vecs: Seq[(Long, Seq[Double])], removed: Set[Long])
      : Set[(Long, Int, Seq[Double])] = {
    import spark.implicits._
    val retained = vecs.filterNot(v => removed(v._1))
    if (retained.isEmpty) Set.empty
    else Similarity.assignCells(retained.toDF("vec_id", "e"), cents)
      .collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("cell")),
        r.getSeq[Double](1)))
      .toSet
  }

  private def runMixed(dir: String, tag: String,
      hist: Seq[(Long, Seq[Double])],
      batches: Seq[Seq[(String, Long, Seq[Double])]], bound: Int,
      maxFiles: Option[String] = Some("1"), persist: Boolean = false)
      : Set[(Long, Int, Seq[Double])] = {
    import spark.implicits._
    val initial = Similarity.assignCells(hist.toDF("vec_id", "e"), cents)
      .select(col("vec_id"), col("cell"), col("e"))
    batches.foreach { b =>
      b.toDF("op", "vec_id", "e").repartition(1)
        .write.mode("append").parquet(s"$dir/in_$tag")
    }
    val src = spark.readStream
      .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
    maxFiles.foreach(m => src.option("maxFilesPerTrigger", m))
    StreamingIvfMixed.maintain(src.parquet(s"$dir/in_$tag"), initial,
        s"$dir/_ckpt_$tag", idCol = "vec_id", mkPostings = mkPostings,
        compactBound = bound,
        persistDir = if (persist) Some(s"$dir/_state_$tag") else None)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
      .toSet
  }

  private val ex = Seq(0.9, 0.1)
  private val ey = Seq(0.1, 0.9)

  test("planted shapes: adds assign under frozen centroids, removes " +
      "drop history AND earlier adds, same-batch add+rm removes, " +
      "no resurrection") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfm").toString
    // history: 1 → cell 0, 2 → cell 1, 3 → cell 0
    val hist = Seq((1L, ex), (2L, ey), (3L, ex))
    // b1: add 10 (cell 1) + rm 3 (history row drops)
    // b2: rm 10 (removes the JUST-added vector) + add 11 (cell 0)
    // b3: add 12 + rm 12 in the SAME batch — removal wins
    // b4: add 3 again — 3 was removed: NO resurrection
    val batches = Seq(
      Seq(("add", 10L, ey), ("rm", 3L, Seq.empty[Double])),
      Seq(("rm", 10L, Seq.empty[Double]), ("add", 11L, ex)),
      Seq(("add", 12L, ey), ("rm", 12L, Seq.empty[Double])),
      Seq(("add", 3L, ex)))
    val allVecs = hist ++ Seq((10L, ey), (11L, ex), (12L, ey))
    val expected = ground(allVecs, Set(3L, 10L, 12L))
    assert(expected.map(_._1) === Set(1L, 2L, 11L))
    for ((tag, bound) <- Seq(("multi", 10000), ("compact", 0))) {
      val got = runMixed(dir, s"$tag", hist, batches, bound)
      assert(got === expected, s"$tag drifted from the retained rebuild")
    }
    // split-invariance: the same ops as ONE batch
    val one = runMixed(dir, "one", hist, Seq(batches.flatten), 10000,
      maxFiles = None)
    assert(one === expected, "single-batch run drifted")
  }

  test("randomized mixed schedules equal the retained rebuild") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val dir =
        java.nio.file.Files.createTempDirectory(s"graft_ivfr$trial").toString
      val hist = (0L until 12L).map(i =>
        i -> (if (i % 2 == 0) ex else ey))
      var live = hist.map(_._1).toSet
      var removed = Set.empty[Long]
      var nextId = 100L
      val batches = Seq.fill(4) {
        Seq.fill(3) {
          if (rnd.nextBoolean() || live.isEmpty) {
            val id = nextId; nextId += 1; live += id
            ("add", id, if (rnd.nextBoolean()) ex else ey)
          } else {
            val id = live.toSeq(rnd.nextInt(live.size))
            live -= id; removed += id
            ("rm", id, Seq.empty[Double])
          }
        }
      }
      val adds = batches.flatten.filter(_._1 == "add")
        .map(b => b._2 -> b._3)
      val expected = ground(hist ++ adds, removed)
      val got = runMixed(dir, "rnd", hist, batches,
        if (trial == 2) 0 else 10000)
      assert(got === expected, s"trial $trial")
    }
  }

  test("the posting layer is O(1) frames in batch count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfo").toString
    val hist = Seq((1L, ex))
    val initial = Similarity.assignCells(hist.toDF("vec_id", "e"), cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val n = StreamingIvfMixed.PostingFrameCap + 5
    (0 until n).foreach { i =>
      Seq(("add", 100L + i, ex)).toDF("op", "vec_id", "e")
        .repartition(1).write.mode("append").parquet(s"$dir/in")
    }
    val st = StreamingIvfMixed.maintainState(
      spark.readStream.schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
      initial, s"$dir/_ckpt", idCol = "vec_id",
      mkPostings = mkPostings, compactBound = 10000, persistDir = None)
    assert(st.postingFrameCount <= StreamingIvfMixed.PostingFrameCap + 1,
      s"layer grew to ${st.postingFrameCount} frames over $n batches")
    assert(st.read.count() === (1 + n).toLong)
  }
}
