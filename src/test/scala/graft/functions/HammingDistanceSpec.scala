package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HammingDistanceSpec extends AnyFunSuite with SparkTestBase {

  test("native expression equals the interpreted per-position formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def bits(n: Int) = Seq.fill(n)(if (rnd.nextBoolean()) "1" else "0").mkString
    val rows = (0 until 200).map(_ => (bits(32), bits(32)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      transform(sequence(lit(1), lit(32)), j =>
        when(col("a").substr(j, lit(1)) =!= col("b").substr(j, lit(1)), 1)
          .otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val out = df.select(
      HammingDistance(col("a"), col("b")).as("native"),
      hof.as("hof")).collect()
    out.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("edge cases: identical, disjoint, null propagation") {
    // SQL name comes from GraftExtensions at session-build time; the
    // shared test session predates injection, so register the builder
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming_distance",
      exprs => HammingDistance(exprs(0), exprs(1)), "built-in")
    val r = spark.sql(
      """SELECT graft_hamming_distance('0101', '0101') AS same,
        |       graft_hamming_distance('0000', '1111') AS all_diff,
        |       graft_hamming_distance('00', CAST(NULL AS STRING)) AS n""".stripMargin)
      .head()
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 4)
    assert(r.isNullAt(2))
  }
}
