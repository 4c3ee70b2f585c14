package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The ORC interchange contract behind q174: lossless round-trip for
  * hostile strings and exact longs, and — the scale-bearing half —
  * predicate pushdown reaching the ORC scan, so a selective read over a
  * 100 TB lake prunes at the stripe/row-group level instead of
  * materializing every row into the JVM first. */
class OrcSourceSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_orc_spec_")
      .resolve("t").toString

  test("round-trips hostile strings and exact longs") {
    import spark.implicits._
    val rows = Seq(
      (Long.MaxValue, "plain"),
      (Long.MinValue, "newline\nand\ttab"),
      (0L, "unicode é中文 and \"quotes\" \\ backslash"),
      (9007199254740993L, "past double's 2^53 integer ceiling"))
    val path = tmp()
    rows.toDF("doc_id", "text").write.orc(path)
    val back = spark.read.schema("doc_id BIGINT, text STRING").orc(path)
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("doc_id predicates reach the ORC scan as pushed filters") {
    import spark.implicits._
    val path = tmp()
    (0L until 100L).toDF("doc_id").write.orc(path)
    val plan = spark.read.schema("doc_id BIGINT").orc(path)
      .where(col("doc_id") > 90)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(doc_id,90)"),
      s"expected a pushed doc_id filter in the scan, got:\n$plan")
  }
}
