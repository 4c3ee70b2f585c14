package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CanonicalSelectSpec extends AnyFunSuite with SparkTestBase {

  private def members = {
    import spark.implicits._
    // (doc_id, cluster_id, prio, n_chars)
    Seq(
      // cluster 1: prio decides (doc 11 from the most-trusted source)
      (10L, 1L, 5, 100L), (11L, 1L, 2, 50L), (12L, 1L, 9, 900L),
      // cluster 2: prio ties -> longer doc wins
      (20L, 2L, 3, 70L), (21L, 2L, 3, 200L),
      // cluster 3: prio and length tie -> smaller doc_id wins
      (30L, 3L, 4, 80L), (31L, 3L, 4, 80L),
      // cluster 4: singleton
      (40L, 4L, 7, 10L))
      .toDF("doc_id", "cluster_id", "prio", "n_chars")
  }

  test("picks by priority, then length desc, then doc_id asc") {
    val out = Dedup.canonicalPerCluster(members, "cluster_id",
      orderCols = Seq(col("prio"), -col("n_chars"), col("doc_id")),
      keepCols = Seq("doc_id", "n_chars"))
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("canonical_doc_id"))))
      .toMap
    assert(out === Map(
      1L -> ((3L, 11L)), 2L -> ((2L, 21L)),
      3L -> ((2L, 30L)), 4L -> ((1L, 40L))))
  }

  test("aggregate combines map-side: no sort, no window in the plan") {
    val plan = Dedup.canonicalPerCluster(members, "cluster_id",
      orderCols = Seq(col("prio"), col("doc_id")),
      keepCols = Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "must not be a row_number window")
    // specifically the min_by partial (n_members' partial_count would
    // satisfy a bare "partial" even if min_by stopped combining map-side)
    assert(plan.contains("partial_min_by"),
      s"min_by must partial-aggregate map-side:\n$plan")
  }
}
