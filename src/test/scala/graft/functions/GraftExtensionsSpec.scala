package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The SQL surface of the native expressions: every injection builder is
  * exercised (construction + the literal-parameter extraction), and each
  * function is callable by name from spark.sql via the lazy
  * registry path (the same builders GraftExtensions injects at
  * session-build time). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("extensions class applies cleanly to a fresh SparkSessionExtensions") {
    new GraftExtensions()(new SparkSessionExtensions) // must not throw
  }

  test("graft_dot_product callable from SQL") {
    DotProduct(spark)(lit(Array(1.0)), lit(Array(1.0))) // registers
    val r = spark.sql(
      "SELECT graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("graft_gram_hashes / graft_winnow_fingerprints callable from SQL " +
      "with literal parameters") {
    GramHashes(spark, 8)(lit("abcdefghij")) // registers k=8 variant
    WinnowFingerprints(spark, 8, 4)(lit("abcdefghij"))
    val g = spark.sql(
      "SELECT size(graft_gram_hashes_8('abcdefghijk')) AS n").head().getInt(0)
    assert(g === 4) // 11 chars, k=8 -> 4 grams
    val w = spark.sql(
      "SELECT graft_winnow_8_4('abcdefghijk') AS fps").head()
      .getSeq[Long](0)
    assert(w.nonEmpty && w == w.sorted)
  }

  test("non-literal int parameter is rejected by the SQL builder") {
    val ext = new GraftExtensions
    // replicate the builder contract directly: k must be a literal
    val thrown = intercept[IllegalArgumentException] {
      ext.buildGramHashes(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "k", org.apache.spark.sql.types.IntegerType)()))
    }
    assert(thrown.getMessage.contains("integer literal"))
  }
}
