package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SnapshotsSpec extends AnyFunSuite with SparkTestBase {

  test("diff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = Snapshots.diff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("identical snapshots diff to empty") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(Snapshots.diff(a, a, "doc_id", "text").count() === 0L)
  }
}
