package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ANN index deletion ([[Similarity.ivfTombstoneTopK]]): serving through
  * the tombstone filter must equal (a) serving a physically compacted
  * posting table and (b) an index REBUILT over the retained corpus under
  * the same frozen centroids — and deleted ids must appear on neither
  * side of any result. */
class IvfRetractSpec extends AnyFunSuite with SparkTestBase {

  private def syntheticEmb(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    // deterministic spread: integer lattice offsets, no RNG
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (((i * 31 + j * 17) % 13) - 6).toDouble / 6.0 + (if (j == i % dim) 2.0 else 0.0)))
    }.toDF("vec_id", "e")
  }

  test("tombstone serving == compacted postings == retained rebuild; " +
      "deleted ids absent from both sides") {
    import spark.implicits._
    val emb = syntheticEmb(60, 8).cache()
    val cents = Similarity.trainCells(emb, k = 4, iters = 2)
    val postings = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val tomb = (0L until 60L).filter(_ % 5 == 2).toDF("vec_id")

    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(1))).toSet

    val served = Similarity
      .ivfTombstoneTopK(postings, cents, tomb, k = 3, probes = 2)
    val servedSet = key(served)

    // (a) physically compacted posting table, same serve path with an
    // EMPTY tombstone set
    val compacted = Similarity.compactPostings(postings, tomb)
    val viaCompacted = Similarity.ivfTombstoneTopK(compacted, cents,
      spark.emptyDataset[Long].toDF("vec_id"), k = 3, probes = 2)
    assert(key(viaCompacted) === servedSet)

    // (b) rebuild over the retained corpus under the SAME centroids
    val retained = emb.where(col("vec_id") % 5 =!= 2)
    val rebuilt = Similarity.ivfMultiProbeTopK(retained, cents,
      k = 3, probes = 2)
      .select(col("vec_id"), col("cos_sim"), col("neighbor_id"))
    assert(key(rebuilt) === servedSet)

    // deleted ids on neither side
    val rows = served.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) % 5 != 2),
      "a tombstoned id was served as a query")
    assert(rows.forall(r => r.getLong(2) % 5 != 2),
      "a tombstoned id surfaced as a neighbor")
  }

  test("assignProbes-widened postings (a=2): tombstone serving == " +
      "retained rebuild at the same widening — duplicate query rows " +
      "collapse and multi-cell pairs dedup before ranking") {
    import spark.implicits._
    val emb = syntheticEmb(60, 8).cache()
    val cents = Similarity.trainCells(emb, k = 4, iters = 2)
    // widened index: one posting row per (vector, 2 nearest cells)
    val postings = Similarity.probeCells(emb, cents, probes = 2)
      .select(col("vec_id"), col("cell"), col("e"))
    val tomb = (0L until 60L).filter(_ % 5 == 2).toDF("vec_id")

    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(1))).toSet

    val served = Similarity.ivfTombstoneTopK(postings, cents, tomb,
      k = 3, probes = 2, assignProbes = 2)
    val rebuilt = Similarity.ivfMultiProbeTopK(
        emb.where(col("vec_id") % 5 =!= 2), cents,
        k = 3, probes = 2, assignProbes = 2)
      .select(col("vec_id"), col("cos_sim"), col("neighbor_id"))
    assert(key(served) === key(rebuilt),
      "widened tombstone serving drifted from the retained rebuild — " +
        "a neighbor reachable via multiple shared cells must occupy " +
        "exactly one rank")
    // every query appears exactly once per rank (no duplicate query rows)
    val perQuery = served.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("d"))
      .collect()
    assert(perQuery.forall(r => r.getLong(1) === r.getLong(2)),
      "a neighbor occupied multiple ranks for one query")
  }

  test("tombstone filter is a broadcast anti-join (no shuffle added to " +
      "the serve path)") {
    import spark.implicits._
    val emb = syntheticEmb(40, 8)
    val cents = Similarity.trainCells(emb, k = 4, iters = 1)
    val postings = Similarity.assignCells(emb, cents)
      .select(col("vec_id"), col("cell"), col("e"))
    val out = Similarity.ivfTombstoneTopK(postings, cents,
      Seq(3L, 7L).toDF("vec_id"), k = 2, probes = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"),
      s"tombstones should anti-join via broadcast:\n$plan")
  }
}
