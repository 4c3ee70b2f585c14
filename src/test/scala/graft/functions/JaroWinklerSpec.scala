package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class JaroWinklerSpec extends AnyFunSuite with SparkTestBase {

  /** Independent reference implementation (list-based, direct from the
    * published definition) — deliberately NOT the kernel's loop shape, so
    * the property test cross-checks two formulations. Byte-based like the
    * kernel (= DuckDB's vendored rapidfuzz semantics). */
  private def refJw(sa: String, sb: String): Double = {
    val a = sa.getBytes("UTF-8").toSeq
    val b = sb.getBytes("UTF-8").toSeq
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val taken = Array.fill(b.length)(false)
    val pairs = a.zipWithIndex.flatMap { case (c, i) =>
      ((math.max(0, i - window) until math.min(b.length, i + window + 1))
        .find(j => !taken(j) && b(j) == c))
        .map { j => taken(j) = true; (i, j) }
    }
    val m = pairs.length
    if (m == 0) return 0.0
    // transpositions: matched b-chars read in a-order vs in b-order,
    // count differing ranks, halve
    val bInAOrder = pairs.map(_._2)
    val tt = bInAOrder.zip(bInAOrder.sorted)
      .count { case (x, y) => b(x) != b(y) } / 2
    val j = (m.toDouble / a.length + m.toDouble / b.length +
      (m - tt).toDouble / m) / 3.0
    if (j > 0.7) {
      val p = a.take(4).zip(b.take(4)).takeWhile { case (x, y) => x == y }.length
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  test("pinned published values and DuckDB-compatible conventions") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      // jaro = 0.6 <= boost threshold 0.7: NO prefix bonus
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),
      ("aaaa", "aaaa", 1.0),
      ("", "", 0.0), // both empty -> 0, the rapidfuzz/DuckDB convention
      ("a", "", 0.0),
      ("abc", "xyz", 0.0),
      // byte semantics: 'é' is two UTF-8 bytes, shrinking the window
      ("éa", "ea", 0.0))
    import spark.implicits._
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    cases.foreach { case (a, b, want) =>
      assert(got((a, b)) === want, s"jw($a, $b)")
    }
  }

  test("property: kernel equals the independent reference on random pairs") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde", "abcdefgh ", "aé†")
    val pairs = (0 until 3000).map { i =>
      val al = alphabets(i % alphabets.length)
      def s() = Seq.fill(rnd.nextInt(14))(al(rnd.nextInt(al.length))).mkString
      (s(), s())
    }
    import spark.implicits._
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
      .collect()
    rows.foreach { r =>
      val want = refJw(r.getString(0), r.getString(1))
      assert(r.getDouble(2) === want,
        s"jw(${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("symmetry, range, and null propagation via the SQL name") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    val r = spark.sql(
      """SELECT graft_jaro_winkler('martha', 'marhta') AS ab,
        |       graft_jaro_winkler('marhta', 'martha') AS ba,
        |       graft_jaro_winkler('abc', CAST(NULL AS STRING)) AS n""".stripMargin)
      .head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.isNullAt(2))
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val vals = (0 until 500)
      .map { _ =>
        def s() = Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(4)).toChar).mkString
        (s(), s())
      }
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw")).collect()
    vals.foreach { r =>
      val v = r.getDouble(0)
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("runs inside whole-stage codegen") {
    import spark.implicits._
    // repartition defeats ConvertToLocalRelation so a real codegen stage
    // materializes
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"))
      .toDF("a", "b").repartition(2)
      .select(JaroWinkler(col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).sorted ===
      Array(0.8400000000000001, 0.9611111111111111))
    // inspect AFTER execution so AQE's final plan (with codegen stages)
    // is the one rendered
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` stage marker is how whole-stage codegen renders; the
    // project evaluating jarowinkler must carry it
    assert(plan.contains("*(1) Project [jarowinkler"),
      s"expected a codegen'd project in:\n$plan")
  }
}
