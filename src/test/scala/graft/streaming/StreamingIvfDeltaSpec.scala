package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.similarity.Clustering

/** q205's load-bearing claim, proven with REAL micro-batch splits: the
  * streamed frozen-centroid delta assignment + complete-mode drift
  * aggregate equals the batch q203 computation however the stream is
  * chopped into batches (the registry gate runs one batch — a staged
  * single file — so the multi-batch leg lives here, forced via
  * maxFilesPerTrigger=1 over a multi-file source). */
class StreamingIvfDeltaSpec extends AnyFunSuite with SparkTestBase {

  test("multi-micro-batch streamed drift aggregate == single-batch == " +
      "batch assignment (count/sum state is arrival-order-free)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sivf").toString
    // 40 vectors, 4-dim, two planted regions + per-id noise; ids % 10 == 7
    // are the delta batch, the rest history
    def vec(i: Long): Seq[Float] = {
      val c = if (i % 2 == 0) 0f else 10f
      Seq(c + (i % 5) * 0.1f, c - (i % 3) * 0.2f, (i % 7) * 0.3f, c)
    }
    val all = (0L until 40L).map(i => (i, vec(i), (i % 4).toInt))
    val df = all.toDF("vec_id", "embedding", "label")
    // 4 files -> 4 micro-batches under maxFilesPerTrigger=1
    df.repartition(4).write.mode("overwrite").parquet(s"$dir/emb")
    assert(new java.io.File(s"$dir/emb").listFiles()
      .count(_.getName.endsWith(".parquet")) >= 2)

    val hist = df.where(pmod(col("vec_id"), lit(10)) =!= 7)
    val cents = Clustering.lloydCentroids(hist, k = 2, updates = 2)

    // ground truth: batch assignment of the delta slice (q203's delta leg)
    val batch = Clustering
      .assign(df.where(pmod(col("vec_id"), lit(10)) === 7), cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_delta"), sum(col("dist2")).as("dist2_delta"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

    for ((tag, maxFiles) <- Seq(("multi", Some("1")), ("single", None))) {
      val src = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      maxFiles.foreach(m => src.option("maxFilesPerTrigger", m))
      val stream = src.parquet(s"$dir/emb")
        .where(pmod(col("vec_id"), lit(10)) === 7)
      val agg = Clustering.assign(stream, cents)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_delta"),
          sum(col("dist2")).as("dist2_delta"))
      val q = agg.writeStream.format("memory").queryName(s"sivf_$tag")
        .option("checkpointLocation", s"$dir/_ckpt_$tag")
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
      if (tag == "multi") // the split actually happened
        assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
          "expected >= 2 non-empty micro-batches under maxFilesPerTrigger=1")
      val got = spark.table(s"sivf_$tag")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === batch, s"$tag-batch streamed aggregate drifted")
    }
  }
}
