package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.similarity.Similarity

/** q120's split-robustness claim, actually exercised: the registry query's
  * single-file source yields one micro-batch, so THIS spec forces FOUR
  * (file-per-trigger over a 4-file copy of the query vectors) and asserts
  * the complete-mode aggregation still equals the batch probed search —
  * i.e. the per-query top-k state genuinely accumulates across batches
  * and the final table is split-invariant. */
class StreamingAnnServingSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streamed probed top-3 equals batch under a forced 4-batch split") {
    val emb = graft.queries.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .cache()
    val cells = Similarity.trainCells(emb, k = 8, iters = 2)
    val cand = Similarity.assignCells(emb.where(col("vec_id") >= 100), cells)
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("e").as("__ne"))

    def topk(queries: org.apache.spark.sql.DataFrame) = {
      val sc = struct(
        (-round(graft.functions.CosineSimilarity(col("e"), col("__ne")),
          6) + 0.0).as("negcos"),
        col("neighbor_id").as("nid"))
      Similarity.probeCells(queries, cells, probes = 2)
        .join(cand, "cell")
        .select(col("vec_id"), sc.as("sc"))
        .groupBy(col("vec_id"))
        .agg(slice(array_sort(collect_list(col("sc"))), 1, 3).as("top"))
    }

    // stage the query vectors as FOUR parquet files
    val staged = java.nio.file.Files.createTempDirectory("graft_annserv")
    emb.where(col("vec_id") < 100).repartition(4)
      .write.mode("overwrite").parquet(staged.toString)
    val qstream = spark.readStream
      .schema("vec_id BIGINT, e ARRAY<DOUBLE>")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_annserv_ck")
    val q = topk(qstream).writeStream
      .format("memory").queryName("ann_serving_split")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.lastProgress.batchId >= 3,
      s"expected >= 4 micro-batches, got ${q.lastProgress.batchId + 1}")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), explode(col("top")).as("sc"))
        .select(col("vec_id"), col("sc.negcos"), col("sc.nid"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
    val streamed = rows(spark.table("ann_serving_split"))
    val batch = rows(topk(emb.where(col("vec_id") < 100)))
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
