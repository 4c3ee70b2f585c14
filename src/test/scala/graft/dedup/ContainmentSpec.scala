package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** containmentJoin's contract is EXACTNESS: identical ORDERED-pair output
  * to the exhaustive all-pairs containment join at the same rational
  * threshold — the contained-side prefix filter and the integer size
  * filter may only prune pairs that cannot qualify. The asymmetric case
  * resemblance misses (a short doc inside a much longer one) is tested
  * explicitly. */
class ContainmentSpec extends AnyFunSuite with SparkTestBase {

  private def gramsDf(docs: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "grams")
      .select(col("doc_id"), array_distinct(col("grams")).as("grams"))
  }

  /** All ORDERED pairs with |A∩B| ≥ (num/den)·|A|. */
  private def brute(docs: Seq[(Long, Seq[String])], num: Int,
      den: Int): Set[(Long, Long, Int)] = {
    val sets = docs.map { case (id, g) => id -> g.toSet }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      common = (sa & sb).size
      if common * den >= sa.size * num
    } yield (ia, ib, common)).toSet
  }

  private def engine(docs: Seq[(Long, Seq[String])], num: Int,
      den: Int): Set[(Long, Long, Int)] =
    Dedup.containmentJoin(gramsDf(docs), num, den).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("common"))).toSet

  private val corpus: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(43)
    val pool = (0 until 60).map(i => s"g$i")
    (0L until 48L).map { id =>
      val n = 3 + rnd.nextInt(12)
      id -> Seq.fill(n)(pool(rnd.nextInt(pool.size)))
    }
  }

  test("matches the exhaustive ordered containment join at every " +
      "tested threshold") {
    for ((num, den) <- Seq((1, 3), (1, 2), (4, 5), (9, 10), (1, 1)))
      assert(engine(corpus, num, den) == brute(corpus, num, den),
        s"threshold $num/$den")
  }

  test("finds the quote resemblance misses: a 4-gram doc fully inside " +
      "a 40-gram doc (jaccard 0.1) at containment 1") {
    val quote = (1L, Seq("q1", "q2", "q3", "q4"))
    val page = (2L, (1 to 36).map(i => s"p$i") ++ quote._2)
    val out = Dedup.containmentJoin(gramsDf(Seq(quote, page)), 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)),
      s"expected only quote→page at containment 1, got ${out.toSeq}")
    // and the symmetric PPJoin at the same corpus finds NOTHING at 1/2
    assert(Dedup.ppjoinExact(gramsDf(Seq(quote, page)), 1, 2)
      .collect().isEmpty)
  }

  test("a pair exactly AT the threshold is kept; one gram short drops") {
    // |A|=4, common=3 → C = 3/4 exactly
    val docs = Seq((1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "x", "y")))
    assert(engine(docs, 3, 4).contains((1L, 2L, 3)))
    assert(!engine(docs, 4, 5).contains((1L, 2L, 3))) // 3 < 4/5·4 = 3.2
  }

  test("identical docs contain each other; empty docs never appear") {
    val docs = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b")),
      (3L, Seq.empty[String]))
    assert(engine(docs, 1, 1) ==
      Set((1L, 2L, 2), (2L, 1L, 2)))
  }
}
