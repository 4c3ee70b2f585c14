package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SemDeDup contract on constructed geometry: within-cell duplicates
  * collapse to the min-id representative; cross-cell near-identical
  * vectors are NOT flagged (the method's documented recall tradeoff). */
class SemDeDupSpec extends AnyFunSuite with SparkTestBase {

  test("semanticDupes keeps one representative per within-cell dup group") {
    import spark.implicits._
    // Two orthogonal directions; ids 1,2,3 cluster on x (3 is a slight
    // rotation — still cos > 0.99 to 1), ids 10,11 cluster on y.
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.001, 0.0)),
      (3L, Array(0.999, 0.01, 0.0)),
      (10L, Array(0.0, 1.0, 0.0)),
      (11L, Array(0.001, 1.0, 0.0)),
      (20L, Array(0.0, 0.0, 1.0)) // isolated singleton
    ).toDF("vec_id", "e")
    val cents = Array(
      0 -> Array(1.0, 0.0, 0.0),
      1 -> Array(0.0, 1.0, 0.0),
      2 -> Array(0.0, 0.0, 1.0))
    val assigned = Similarity.assignCells(emb, cents)
    val out = Similarity.semanticDupes(assigned, threshold = 0.99)
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
    assert(out(1L) === ((None, false))) // group representative
    assert(out(2L) === ((Some(1L), true)))
    assert(out(3L) === ((Some(1L), true)))
    assert(out(10L) === ((None, false)))
    assert(out(11L) === ((Some(10L), true)))
    assert(out(20L) === ((None, false)))
  }

  test("cross-cell near-identicals are not flagged (recall tradeoff)") {
    import spark.implicits._
    // 45-degree vector: cos ~0.7 to both centroids; its twin lands in the
    // SAME cell (tiebreak min cell), but a pair split across cells by the
    // quantizer would be missed — model that with explicit cells here.
    val emb = Seq(
      (1L, Array(1.0, 0.0)),
      (2L, Array(1.0, 0.0001))
    ).toDF("vec_id", "e")
    val cents = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    // force 2 into the other cell to model a quantizer boundary split
    val assigned = Similarity.assignCells(emb, cents)
      .withColumn("cell", when(col("vec_id") === 2L, 1).otherwise(col("cell")))
    val out = Similarity.semanticDupes(assigned, threshold = 0.99)
      .where(col("is_dup")).count()
    assert(out === 0L) // same pair, split cells -> not flagged
  }
}
