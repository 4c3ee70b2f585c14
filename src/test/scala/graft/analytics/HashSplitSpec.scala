package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HashSplitSpec extends AnyFunSuite with SparkTestBase {

  private val fractions =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("proportions approach the fractions and every label appears") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("id")
    val counts = Sampling.hashSplit(df, "id", fractions)
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 5000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 5000.0 - 0.1) < 0.02)
  }

  test("assignment is stable when the corpus grows") {
    import spark.implicits._
    def assign(n: Long): Map[Long, String] =
      Sampling.hashSplit((0L until n).toDF("id"), "id", fractions)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
        .toMap
    val small = assign(500L)
    val large = assign(2000L)
    small.foreach { case (id, s) =>
      assert(large(id) === s, s"id $id changed split on corpus growth")
    }
  }

  test("a different salt draws an independent assignment") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.hashSplit(df, "id", fractions, salt = "s1")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
      .toMap
    val b = Sampling.hashSplit(df, "id", fractions, salt = "s2")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
      .toMap
    val moved = a.count { case (id, s) => b(id) != s }
    assert(moved > 100, s"only $moved of 2000 moved under a new salt")
  }

  test("splitLabel recomputes hashSplit's assignment on any frame, join-free") {
    import spark.implicits._
    val viaSplit = Sampling
      .hashSplit((0L until 1000L).toDF("id"), "id", fractions, salt = "split")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
      .toMap
    // the q102 audit shape: a pair frame labels both endpoints in place —
    // two projections, never two joins against a materialized split table
    val labeled = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        Sampling.splitLabel(col("id_a"), fractions, "split").as("sa"),
        Sampling.splitLabel(col("id_b"), fractions, "split").as("sb"))
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"),
      s"endpoint labeling must be a pure projection:\n$plan")
    labeled.collect().foreach { r =>
      assert(r.getAs[String]("sa") === viaSplit(r.getAs[Long]("id_a")))
      assert(r.getAs[String]("sb") === viaSplit(r.getAs[Long]("id_b")))
    }
  }

  test("a NULL id fails loudly instead of landing in the last split") {
    // pre-guard behavior: NULL id -> NULL digest -> every `u < cut` is
    // null-false -> the row silently became 'test' data
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[Exception] {
      Sampling.hashSplit(df, "id", fractions).collect()
    }
    assert(e.getMessage.contains("NULL id") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL id")),
      s"expected the loud NULL-id failure, got: ${e.getMessage}")
  }

  test("invalid fractions are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 1.5, "b" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq.empty)
    }
  }
}
