package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SpectralSpec extends AnyFunSuite with SparkTestBase {

  test("topEigen recovers the dominant axis of a diagonal matrix") {
    import spark.implicits._
    // G = diag(3, 1): top eigenvector (1, 0), λ = 3, explained = 0.75
    val gram = Seq((0, 0, 3.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0))
      .toDF("i", "j", "g")
    val r = Spectral.topEigen(gram, dim = 2, iters = 25)
      .orderBy(col("i")).collect()
    assert(math.abs(r(0).getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(r(1).getDouble(1)) < 1e-9)
    assert(math.abs(r(0).getDouble(2) - 3.0) < 1e-9)   // ev
    assert(math.abs(r(0).getDouble(3) - 0.75) < 1e-9)  // explained
  }

  test("sign canonicalization: largest-|loading| coordinate is positive") {
    import spark.implicits._
    // G with dominant direction (-0.8, 0.6)-ish would be sign-ambiguous;
    // after canon the max-|v| coordinate must be positive
    val gram = Seq((0, 0, 4.0), (0, 1, -2.0), (1, 0, -2.0), (1, 1, 2.0))
      .toDF("i", "j", "g")
    val r = Spectral.topEigen(gram, dim = 2, iters = 30)
      .orderBy(col("i")).collect()
    val vs = r.map(_.getDouble(1))
    val iMax = vs.indices.maxBy(k => math.abs(vs(k)))
    assert(vs(iMax) > 0.0)
  }

  test("gramMatrix centers: constant dimension contributes zero variance") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0, 5.0)), (2L, Seq(3.0, 5.0)),
      (3L, Seq(5.0, 5.0))).toDF("vec_id", "e")
    val g = Spectral.gramMatrix(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(g((1, 1))) < 1e-12) // dim 1 is constant
    assert(math.abs(g((0, 1))) < 1e-12)
    // dim 0: population variance of {1,3,5} = 8/3
    assert(math.abs(g((0, 0)) - 8.0 / 3) < 1e-12)
  }
}
