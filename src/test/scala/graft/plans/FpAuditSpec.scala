package graft.plans

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for [[FpAudit]]'s classification rules — in particular the two
  * formerly documented blind spots (Union later branches, subquery plans) and
  * the guard-scale margin rule. Each case is the smallest plan exhibiting the
  * shape; the registry-wide sweep lives in FpDeterminismSpec.
  */
class FpAuditSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def base = Seq((1, 1.5), (2, 2.5), (1, 3.5)).toDF("k", "v")

  test("unguarded double sum flags; round(…, 2) above it guards") {
    val bad = base.groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
    assert(FpAudit.audit(bad) == Seq("s"))
    val good = bad.selectExpr("k", "round(s, 2) as s")
    assert(FpAudit.audit(good).isEmpty)
  }

  test("round below the aggregate does not guard") {
    val df = base.selectExpr("k", "round(v, 2) as v")
      .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
    assert(FpAudit.audit(df) == Seq("s"))
  }

  test("a round finer than MaxGuardScale is a guard in name only") {
    val agg = base.groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
    // round(s, 12) quantizes at 1e-12 — below the ~1e-9 reorder error, so it
    // cannot absorb a plan-order change and must NOT count as a guard
    assert(FpAudit.audit(agg.selectExpr("k", "round(s, 12) as s")) == Seq("s"))
    // DECIMAL(38,18) back to double: same no-margin story
    assert(FpAudit.audit(
      agg.selectExpr("k", "cast(cast(s as decimal(38,18)) as double) as s")) == Seq("s"))
    // DECIMAL(38,4) genuinely quantizes
    assert(FpAudit.audit(
      agg.selectExpr("k", "cast(cast(s as decimal(38,4)) as double) as s")).isEmpty)
  }

  test("an order-sensitive aggregate hidden in a SECOND union branch flags") {
    val safe = base.groupBy($"k")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum($"v"), 2).as("s"))
    val unsafeBranch = base.groupBy($"k")
      .agg(org.apache.spark.sql.functions.sum($"v").as("s"))
    // Union output borrows the FIRST child's exprIds — the old auditor only
    // ever saw the guarded branch and passed this plan
    assert(FpAudit.audit(safe.union(unsafeBranch)) == Seq("s"))
    // both branches guarded: clean
    assert(FpAudit.audit(safe.union(safe)).isEmpty)
  }

  test("an unrounded double sum inside a scalar subquery flags") {
    base.createOrReplaceTempView("fp_audit_base")
    val viaSubquery = spark.sql(
      "SELECT k, v / (SELECT sum(v) FROM fp_audit_base) AS share FROM fp_audit_base")
    assert(FpAudit.audit(viaSubquery) == Seq("share"))
    val guarded = spark.sql(
      "SELECT k, round(v / (SELECT sum(v) FROM fp_audit_base), 4) AS share FROM fp_audit_base")
    assert(FpAudit.audit(guarded).isEmpty)
    // a guard INSIDE the subquery also counts: the subquery's value is exact
    val innerGuard = spark.sql(
      "SELECT k, v / (SELECT round(sum(v), 2) FROM fp_audit_base) AS share FROM fp_audit_base")
    assert(FpAudit.audit(innerGuard).isEmpty)
    spark.catalog.dropTempView("fp_audit_base")
  }

  test("integral sums and ordered-window folds stay clean") {
    val intSum = Seq((1, 2L)).toDF("k", "n").groupBy($"k")
      .agg(org.apache.spark.sql.functions.sum($"n").as("s"))
      .selectExpr("k", "cast(s as double) as s")
    assert(FpAudit.audit(intSum).isEmpty)
    val win = base.selectExpr("k", "v",
      "sum(v) over (partition by k order by v rows between unbounded preceding and current row) as c")
    assert(FpAudit.audit(win).isEmpty)
  }
}
