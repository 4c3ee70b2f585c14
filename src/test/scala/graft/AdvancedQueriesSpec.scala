package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Invariant-level tests for the second relational sweep (q48-q57).
  * Engine-vs-oracle value equality is the driver gate's job; these assert
  * the algorithmic invariants that a hash compare can't express. */
class AdvancedQueriesSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q55 cluster labels are a valid connected-components solution") {
    val labels = Registry.byName("q55_dedup_clusters").run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Registry.byName("q26_jaccard_pairs").run(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every edge's endpoints agree on the cluster
    edges.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"edge ($a,$b) split across clusters")
    }
    // a cluster's id is the minimum member id, and the id is a member
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid)
    }
    // labels cover exactly the documents table
    assert(labels.size === 500)
  }

  test("q52 session stats partition the events exactly") {
    val rows = Registry.byName("q52_sessionize").run(spark, dir).collect()
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    val nEvents = queries.Tables(spark, dir, "events").count()
    assert(totalEvents === nEvents) // sessions partition each user's events
    rows.foreach { r =>
      assert(r.getAs[Long]("max_sess_len") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_sessions") >= 1L)
    }
  }

  test("q49 cube totals are consistent across grouping sets") {
    val rows = Registry.byName("q49_cube_pricing").run(spark, dir).collect()
    def n(gid: Long) =
      rows.filter(_.getAs[Long]("gid") == gid).map(_.getAs[Long]("n")).sum
    assert(n(0) === n(1)) // finest cells sum to the flag-level marginals
    assert(n(0) === n(2))
    assert(n(0) === n(3)) // and to the grand total
  }

  test("q51 quantiles are ordered and within the value range") {
    val rows = Registry.byName("q51_group_quantiles").run(spark, dir).collect()
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("q48 pivot cells match the filtered aggregates") {
    val piv = Registry.byName("q48_pivot_revenue").run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    import org.apache.spark.sql.functions._
    val flat = queries.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // q48's cells are round(…, 2) (FP-determinism convention), the
    // reference aggregate here is raw — allow the half-cent quantum
    piv.foreach { case (flag, (f, o)) =>
      assert(math.abs(f - flat((flag, "F"))) <= 0.005)
      assert(math.abs(o - flat((flag, "O"))) <= 0.005)
    }
  }
}
