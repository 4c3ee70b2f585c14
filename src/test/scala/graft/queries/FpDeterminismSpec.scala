package graft.queries

import graft.SparkTestBase
import graft.plans.FpAudit
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide gate for the FP-order divergence class (the round-11 q185
  * red): every oracle-HASHED query must have zero fractional output columns
  * whose value depends on aggregation order — see [[graft.plans.FpAudit]].
  * Rows-only queries (oracle = None) cannot hash-flake and are skipped.
  * Queries are built (lazily analyzed, not executed) at sf0.001; streaming
  * queries construct real micro-batch runs, so they are the slow tail.
  */
class FpDeterminismSpec extends AnyFunSuite with SparkTestBase {

  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("no oracle-hashed query emits an order-sensitive fractional column") {
    val flagged = Registry.all.filter(_.oracle.isDefined).flatMap { q =>
      val cols =
        try FpAudit.audit(q.run(spark, dir))
        catch { case e: Throwable => Seq(s"<build failed: ${e.getClass.getSimpleName}: ${e.getMessage}>") }
      if (cols.isEmpty) Nil else Seq(s"${q.name}: ${cols.mkString(", ")}")
    }
    assert(flagged.isEmpty,
      s"\nOrder-sensitive unrounded fractional aggregates (round both the " +
        s"engine and oracle sides — see FpAudit scaladoc):\n  " +
        flagged.mkString("\n  "))
  }
}
