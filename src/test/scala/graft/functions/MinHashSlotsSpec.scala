package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** MinHashSlots: the fused native pass equals an independent BigInt
  * reference of the same scheme (whole-string double polynomial fold + K
  * universal mixes + per-slot min), the constants match the DuckDB oracle
  * fragment's spelled-out literals, and the DataFrame path (codegen)
  * agrees with direct eval. */
class MinHashSlotsSpec extends AnyFunSuite with SparkTestBase {

  private val P = 2147483647L

  private def refHash(s: String, b: Long, m: Long): Long =
    s.foldLeft(BigInt(0))((acc, c) => (acc * b + c.toLong) % m).toLong

  private def refSig(grams: Seq[String], k: Int): Array[Long] = {
    val slots = Array.fill(k)(Long.MaxValue)
    grams.foreach { g =>
      val h1 = BigInt(refHash(g, 131L, 2147483647L))
      val h2 = BigInt(refHash(g, 137L, 2147483629L))
      for (i <- 1 to k) {
        val a = BigInt(1103515245L * i + 12345L) % P
        val c = BigInt(69069L * i + 1L) % P
        val b = BigInt(40503L * i + 7L) % P
        val v = ((a * h1) % P + (c * h2) % P + b).mod(P).toLong
        if (v < slots(i - 1)) slots(i - 1) = v
      }
    }
    slots
  }

  private def native(grams: Seq[String], k: Int): Array[Long] =
    MinHashSlots.compute(
      ArrayData.toArrayData(grams.map(UTF8String.fromString).toArray), k)

  test("known values pin the cross-engine arithmetic (the DuckDB fold " +
      "was executed against these literals)") {
    // list_reduce fold in DuckDB over the same string returned 874795440
    assert(refHash("hello world abc", 131L, 2147483647L) === 874795440L)
    assert(refHash("hello world abc", 137L, 2147483629L) === 1786246077L)
    val sig = native(Seq("hello world abc"), 1)
    assert(sig(0) === 1615994656L)
  }

  test("fused pass equals the BigInt reference on pseudo-random gram sets") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    for (trial <- 0 until 30) {
      val nGrams = 1 + rnd.nextInt(20)
      val grams = Seq.fill(nGrams)(
        (0 until (1 + rnd.nextInt(25)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      for (k <- Seq(1, 12, 64)) {
        assert(native(grams, k).toSeq === refSig(grams, k).toSeq,
          s"trial $trial k=$k grams=$grams")
      }
    }
  }

  test("empty input yields an empty signature; order/duplicates of the " +
      "gram SET do not change it (min is commutative and idempotent)") {
    assert(native(Seq.empty, 12).isEmpty)
    val g = Seq("alpha beta gamma", "beta gamma delta", "x1 y2 z3")
    assert(native(g, 12).toSeq === native(g.reverse, 12).toSeq)
    assert(native(g, 12).toSeq === native(g ++ g, 12).toSeq)
  }

  test("every slot value is in [0, P); distinct gram sets get distinct " +
      "signatures on this corpus") {
    val sigs = (0 until 50).map(i => native(Seq(s"gram $i", s"tail $i"), 12))
    sigs.foreach(_.foreach(v => assert(v >= 0L && v < P)))
    assert(sigs.map(_.toSeq).distinct.size === 50)
  }

  test("DataFrame path (whole-stage codegen) agrees with direct compute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("alpha beta gamma", "beta gamma delta")),
      (2L, Seq("one two three")),
      (3L, Seq.empty[String]))
      .toDF("id", "grams")
      .select($"id", MinHashSlots(12)($"grams").as("sig"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) === native(Seq("alpha beta gamma", "beta gamma delta"), 12).toSeq)
    assert(got(2L) === native(Seq("one two three"), 12).toSeq)
    assert(got(3L).isEmpty)
  }
}
