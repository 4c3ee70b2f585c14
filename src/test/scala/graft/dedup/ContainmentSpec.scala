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

  test("containmentAcross matches the exhaustive cross join and never " +
      "forms within-side pairs; grams unseen by the corpus still prune") {
    val rnd = new scala.util.Random(44)
    val pool = (0 until 40).map(i => s"g$i")
    val probeDocs = (100L until 116L).map { id =>
      // half the probes carry grams the corpus never has (pX tokens)
      val extra = if (id % 2 == 0) Seq(s"p$id") else Nil
      id -> (Seq.fill(3 + rnd.nextInt(6))(
        pool(rnd.nextInt(pool.size))) ++ extra)
    }
    val corpusDocs = (0L until 24L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(10))(pool(rnd.nextInt(pool.size)))
    }
    for ((num, den) <- Seq((1, 2), (4, 5), (1, 1))) {
      val pSets = probeDocs.map { case (i, g) => i -> g.toSet }
      val cSets = corpusDocs.map { case (i, g) => i -> g.toSet }
      val expected = (for {
        (ip, sp) <- pSets; (ic, sc) <- cSets
        common = (sp & sc).size
        if common * den >= sp.size * num
      } yield (ip, ic, common)).toSet
      val got = Dedup.containmentAcross(
          gramsDf(probeDocs).withColumnRenamed("doc_id", "probe_id"),
          gramsDf(corpusDocs), num, den)
        .collect().map(r => (r.getAs[Long]("probe_id"),
          r.getAs[Long]("doc_id"), r.getAs[Int]("common"))).toSet
      assert(got == expected, s"threshold $num/$den")
      assert(got.forall { case (p, c, _) => p >= 100L && c < 100L })
    }
  }

  test("identical docs contain each other; empty docs never appear") {
    val docs = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b")),
      (3L, Seq.empty[String]))
    assert(engine(docs, 1, 1) ==
      Set((1L, 2L, 2), (2L, 1L, 2)))
  }
}
