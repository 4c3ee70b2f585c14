package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The quantized-vector kernels must equal the HOF formulations
  * bit-for-bit (integer addition is associative, so this is exact
  * equality, not tolerance), and survive codegen. */
class LongVectorOpsSpec extends AnyFunSuite with SparkTestBase {

  test("SqDistLong / DotProductLong equal the HOF forms exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map(_ =>
      (Seq.fill(64)(rnd.nextInt(20001) - 10000L),
        Seq.fill(64)(rnd.nextInt(20001) - 10000L)))
    val df = rows.toDF("a", "b")
    val hofDist = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
    val hofDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val out = df.select(
      SqDistLong(col("a"), col("b")).as("nd"),
      hofDist.as("hd"),
      DotProductLong(col("a"), col("b")).as("np"),
      hofDot.as("hp")).collect()
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("NULL input yields NULL (null-intolerant), empty arrays yield 0") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Option.empty[Seq[Long]]),
      (Seq.empty[Long], Some(Seq.empty[Long])))
      .toDF("a", "b")
    val out = df.select(SqDistLong(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) === 0L)
  }
}
