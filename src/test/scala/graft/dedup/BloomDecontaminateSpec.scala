package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The bloom decontamination contract: exact-join equality (no false
  * negatives; verify kills false positives) and a real prune rate. */
class BloomDecontaminateSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def gram8() =
    Dedup.shingles(
      graft.queries.Tables.sharded(spark, dir, "documents", "doc_id"), n = 8)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .cache()

  test("bloom path result equals the exact broadcast join exactly") {
    val g = gram8()
    val corpus = g.where(col("doc_id") % 10 =!= 7)
    val bench = g.where(col("doc_id") % 10 === 7).select(col("gram"))
    val bloomed = Dedup.bloomDecontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = corpus.join(broadcast(bench.distinct()), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomed === exact)
    assert(exact.nonEmpty) // the check is vacuous on an empty corpus
  }

  test("bloom probe prunes the corpus gram stream hard (fpp-bounded)") {
    val g = gram8()
    val corpus = g.where(col("doc_id") % 10 =!= 7)
    val bench = g.where(col("doc_id") % 10 === 7).select(col("gram"))
      .distinct()
    val nBench = bench.count()
    val bf = bench.select(xxhash64(col("gram")).as("h"))
      .stat.bloomFilter("h", math.max(nBench, 1L), 0.01)
    val total = corpus.count()
    val passed = corpus.where(
      graft.functions.BloomMightContain(bf)(xxhash64(col("gram"))))
      .count()
    val trueHits = corpus.join(broadcast(bench), "gram").count()
    // survivors = true hits + false positives; fpp 0.01 with 5x headroom
    assert(passed >= trueHits)
    assert(passed - trueHits <= math.max(20L, (total * 0.05).toLong),
      s"bloom passed $passed of $total (true hits $trueHits) — fpp broken?")
    assert(passed < total, "bloom pruned nothing")
  }
}
