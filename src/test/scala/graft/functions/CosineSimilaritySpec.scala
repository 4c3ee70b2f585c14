package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CosineSimilaritySpec extends AnyFunSuite with SparkTestBase {

  test("native expression equals the HOF formulation bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val rows = (0 until 50).map(_ =>
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (acc, x) => acc + x)) *
        sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (acc, x) => acc + x)))
    val out = df.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      hof.as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("SQL surface: graft_cosine_similarity callable from spark.sql") {
    // SQL users get the name via GraftExtensions at session-build time;
    // the shared test session predates injection, so register the same
    // builder directly (GraftExtensionsSpec covers the builder surface)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    val r = spark.sql(
      """SELECT graft_cosine_similarity(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c""")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12) // parallel vectors
    // orthogonal vectors
    val o = spark.sql(
      """SELECT graft_cosine_similarity(array(1.0D, 0.0D), array(0.0D, 3.0D)) AS c""")
      .head().getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("zero-norm vectors yield NULL (never NaN): fails thresholds and " +
      "sorts last instead of poisoning every top-k") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0, 0.0), Array(1.0, 2.0)), // zero left
      (2L, Array(1.0, 2.0), Array(0.0, 0.0)), // zero right
      (3L, Array(1.0, 0.0), Array(1.0, 0.0))) // sane pair
      .toDF("id", "a", "b")
      .withColumn("c", CosineSimilarity(col("a"), col("b")))
    val rows = df.orderBy(col("id")).collect()
    assert(rows(0).isNullAt(3) && rows(1).isNullAt(3))
    assert(math.abs(rows(2).getDouble(3) - 1.0) < 1e-12)
    // NULL fails the near-dup gate (NaN >= t would pass it)
    assert(df.where(col("c") >= 0.5).count() === 1)
    // NULL sorts LAST under desc (NaN would sort first, above 1.0)
    assert(df.orderBy(col("c").desc).head().getLong(0) === 3L)
  }
}
