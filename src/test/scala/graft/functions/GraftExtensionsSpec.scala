package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The SQL surface of the native expressions: every injection builder is
  * exercised through spark.sql with the CANONICAL names and literal int
  * parameters — the exact builders GraftExtensions injects at
  * session-build time (the shared test session predates extension
  * injection, so the builders are registered into its function registry
  * directly; `withExtensions` performs the same registration). */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private val ext = new GraftExtensions

  private def register(name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  test("extensions class applies cleanly to a fresh SparkSessionExtensions") {
    new GraftExtensions()(new SparkSessionExtensions) // must not throw
  }

  test("graft_dot_product / graft_cosine_similarity callable from SQL") {
    register("graft_dot_product", exprs => DotProduct(exprs(0), exprs(1)))
    register("graft_cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    val r = spark.sql(
      "SELECT graft_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
    val c = spark.sql(
      "SELECT graft_cosine_similarity(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("graft_gram_hashes / graft_winnow_fingerprints callable from SQL " +
      "with literal parameters") {
    register("graft_gram_hashes", ext.buildGramHashes)
    register("graft_winnow_fingerprints", ext.buildWinnow)
    val g = spark.sql(
      "SELECT size(graft_gram_hashes('abcdefghijk', 8)) AS n")
      .head().getInt(0)
    assert(g === 4) // 11 chars, k=8 -> 4 grams
    val w = spark.sql(
      "SELECT graft_winnow_fingerprints('abcdefghijk', 8, 4) AS fps").head()
      .getSeq[Long](0)
    assert(w.nonEmpty && w == w.sorted)
  }

  test("non-literal int parameter is rejected by the SQL builder") {
    // replicate the builder contract directly: k must be a literal
    val thrown = intercept[IllegalArgumentException] {
      ext.buildGramHashes(Seq(
        Literal("x"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "k", org.apache.spark.sql.types.IntegerType)()))
    }
    assert(thrown.getMessage.contains("integer literal"))
  }
}
