package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.SkewJoin

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("salted join == plain join on a hot-key distribution") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 90% of rows hit key 0 — the hot-reducer shape
    val big = (1 to 5000).map(i =>
      (if (rnd.nextDouble() < 0.9) 0L else rnd.nextInt(50).toLong, i))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, "k")
      .select($"k", $"payload", $"name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = SkewJoin.salted(big, small, "k", nSalts = 8)
      .select(big("k"), $"payload", $"name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted

    assert(salted.length === plain.length)
    assert(salted === plain)
  }
}
