package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.queries.Tables

/** The embedding near-dup contract: exact precision (every returned pair
  * truly clears the cosine threshold — guaranteed by the verify stage) and
  * MEASURED recall of the banded-LSH candidate generation against the
  * brute-force truth. */
class EmbeddingNearDupSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val Threshold = 0.4

  private lazy val emb = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .cache()

  private lazy val exact: Set[(Long, Long)] = {
    val cos = graft.functions.CosineSimilarity(col("__ae"), col("__be"))
    emb.select(col("vec_id").as("id_a"), col("e").as("__ae"))
      .join(emb.select(col("vec_id").as("id_b"), col("e").as("__be")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
      .where(col("cos_sim") >= Threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val lsh: Set[(Long, Long)] = Similarity
    .cosineNearDupPairs(emb, dim = 64, threshold = Threshold)
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("every LSH-found pair is a true near-dup (exact precision)") {
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(lsh.nonEmpty)
  }

  test("banded-LSH recall at cos>=0.4 clears 0.6 (measured, 6 bands x 3 " +
      "planes)") {
    val recall = lsh.size.toDouble / exact.size
    info(f"recall = ${lsh.size}/${exact.size} = $recall%.3f")
    assert(exact.size >= 30, s"expected a meaningful truth set: ${exact.size}")
    assert(recall >= 0.6, f"recall $recall%.3f")
  }
}
