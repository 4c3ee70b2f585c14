package graft.measures

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Count-min-sketch contract: estimates never undercount, and the
  * overestimate is bounded by eps·N (the CMS guarantee, here with zero
  * failure slack since eps·N covers the whole stream). */
class CmsHeavyHitterSpec extends AnyFunSuite with SparkTestBase {

  private def check(dir: String): Unit = {
    val toks = graft.queries.Tables.sharded(spark, dir, "documents", "doc_id")
      .select(explode(graft.dedup.Dedup.tokens(col("text"))).as("token"))
      .cache()
    val n = toks.count()
    val eps = 0.0001
    val cms = toks.stat
      .countMinSketch(col("token"), eps = eps, confidence = 0.99, seed = 42)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(50)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val bound = math.max(1L, (eps * n * 5).toLong) // 5x headroom on eps·N
    exact.foreach { case (tok, c) =>
      val est = cms.estimateCount(tok)
      assert(est >= c, s"CMS undercounted $tok: $est < $c")
      assert(est - c <= bound,
        s"CMS overestimate for $tok: $est vs $c exceeds ${bound} (N=$n)")
    }
    toks.unpersist()
  }

  test("estimates bounded at sf0.001") { check("/root/testdata/sf0.001") }
  test("estimates bounded at sf0.01") { check("/root/testdata/sf0.01") }
}
