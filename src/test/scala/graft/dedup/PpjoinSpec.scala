package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ppjoinExact's contract is EXACTNESS: identical output to the
  * exhaustive all-pairs Jaccard join at the same rational threshold —
  * the length/prefix filters may only prune pairs that cannot qualify.
  * The brute force here enumerates every pair driver-side (test scale);
  * the engine path goes through df-ordered prefixes and the candidate
  * equi-join. */
class PpjoinSpec extends AnyFunSuite with SparkTestBase {

  private def gramsDf(docs: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "grams")
      .select(col("doc_id"), array_distinct(col("grams")).as("grams"))
  }

  /** All-pairs ground truth: (id_a, id_b, common, jaccard≥num/den). */
  private def brute(docs: Seq[(Long, Seq[String])], num: Int,
      den: Int): Set[(Long, Long, Int)] = {
    val sets = docs.map { case (id, g) => id -> g.toSet }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      common = (sa & sb).size
      if common * den >= (sa.size + sb.size - common) * num
    } yield (ia, ib, common)).toSet
  }

  private def engine(docs: Seq[(Long, Seq[String])], num: Int,
      den: Int): Set[(Long, Long, Int)] =
    Dedup.ppjoinExact(gramsDf(docs), num, den).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("common"))).toSet

  // Seeded corpus over a small gram pool — overlapping sets at every
  // similarity level, including many pairs near the thresholds.
  private val corpus: Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(42)
    val pool = (0 until 60).map(i => s"g$i")
    (0L until 48L).map { id =>
      val n = 3 + rnd.nextInt(12)
      id -> Seq.fill(n)(pool(rnd.nextInt(pool.size)))
    }
  }

  test("matches the exhaustive join at every tested threshold") {
    for ((num, den) <- Seq((1, 3), (1, 2), (3, 4), (9, 10), (1, 1))) {
      assert(engine(corpus, num, den) == brute(corpus, num, den),
        s"threshold $num/$den")
    }
  }

  test("a pair exactly AT the threshold is kept (integer compare)") {
    // |A|=3, |B|=3, common=2 → J = 2/4 = 1/2 exactly
    val docs = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "d"))
    assert(engine(docs, 1, 2) == Set((1L, 2L, 2)))
    // …and is dropped one notch above (51/100)
    assert(engine(docs, 51, 100) == Set.empty[(Long, Long, Int)])
  }

  test("identical, disjoint, and empty documents") {
    val docs = Seq(
      1L -> Seq("x", "y", "z"),
      2L -> Seq("x", "y", "z"),   // identical twin: J = 1
      3L -> Seq("p", "q"),        // disjoint from all
      4L -> Seq.empty[String])    // no grams: never a candidate
    assert(engine(docs, 1, 1) == Set((1L, 2L, 3)))
  }

  test("jaccard column equals common/(na+nb-common)") {
    val got = Dedup.ppjoinExact(gramsDf(corpus), 1, 3).collect()
    assert(got.nonEmpty)
    val sets = corpus.toMap.map { case (k, v) => k -> v.toSet }
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val c = (sets(a) & sets(b)).size.toDouble
      val want = c / (sets(a).size + sets(b).size - c)
      assert(math.abs(r.getAs[Double]("jaccard") - want) < 1e-12)
    }
  }
}
