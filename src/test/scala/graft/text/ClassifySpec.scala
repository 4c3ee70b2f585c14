package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ClassifySpec extends AnyFunSuite with SparkTestBase {

  /** Corpus with a vocabulary so class-separated that any sane NB must
    * recover the labels: `tech` docs speak kernel/compiler words, `food`
    * docs speak recipe words. Ids are dense so the 80/20 hash split
    * leaves both classes represented on both sides. */
  private lazy val docs = {
    import spark.implicits._
    val tech = Seq("kernel compiler linker syscall", "compiler bytecode jit",
      "kernel scheduler interrupt syscall", "linker relocation symbol",
      "jit bytecode inline compiler", "syscall driver kernel module")
    val food = Seq("butter flour sugar oven", "simmer garlic onion broth",
      "oven dough yeast flour", "broth simmer carrot onion",
      "sugar vanilla butter cream", "garlic olive basil tomato")
    (tech.zipWithIndex.map { case (t, i) => (i.toLong, t, "tech") } ++
      food.zipWithIndex.map { case (t, i) => (100L + i, t, "food") })
      .toDF("doc_id", "text", "source")
  }

  test("recovers planted classes on held-out docs") {
    val pred = Classify.naiveBayesPredict(docs, "source").collect()
    assert(pred.nonEmpty, "hash split left no test docs — widen the corpus")
    pred.foreach { r =>
      val truth = if (r.getLong(0) < 100) "tech" else "food"
      assert(r.getString(1) === truth,
        s"doc ${r.getLong(0)} predicted ${r.getString(1)}")
    }
  }

  test("unseen words smooth instead of zeroing and scores stay finite") {
    import spark.implicits._
    val withNovel = docs.union(
      Seq((200L, "zyzzyva qwerty plugh xyzzy", "tech"))
        .toDF("doc_id", "text", "source"))
    val pred = Classify.naiveBayesPredict(withNovel, "source")
      .collect()
    pred.foreach { r =>
      val s = r.getDouble(2)
      assert(!s.isNaN && !s.isInfinite, s"non-finite score for ${r.getLong(0)}")
      assert(s < 0.0, "joint log-likelihood must be negative")
    }
  }

  test("exactly one prediction per held-out doc") {
    val pred = Classify.naiveBayesPredict(docs, "source")
    val ids = pred.select("doc_id").collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
  }
}
