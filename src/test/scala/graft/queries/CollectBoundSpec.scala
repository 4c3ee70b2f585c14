package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.plans.CollectAudit

/** Registry-wide gate for the BOUNDED-COLLECT discipline (the r16
  * verdict's next-round #4, mechanized like FpDeterminismSpec did for
  * FP order): every `.collect()` a query performs while it BUILDS —
  * quantizer training, threshold tables, delta remaps, streaming-fold
  * state, prefix offsets — must deliver a driver-bounded row count. A
  * corpus-sized internal collect works at test scale and dies at
  * 100 TB; this gate fails the build the day one appears.
  *
  * The ceiling is [[Ceiling]] rows per internal collect: the
  * registry's legitimate collects measured across the whole registry
  * are the CORPUS-INDEPENDENT training constants — d² Gram cells
  * (4096), m·ksub·sd PQ codebook rows (2048), k·d Lloyd update rows
  * (256) — plus ≤ 6-row thresholds, partition-count prefix offsets,
  * monitor aggregates (≤ k), and batch-/compactBound-sized maintainer
  * state; the ceiling clears the largest constant with ~10% margin and
  * sits well under every pair-level, exploded, or big-table row count.
  * Unknown row counts (no metric anywhere in the executed plan) also
  * flag: an unmeasurable collect is not a bounded one.
  *
  * EXCLUDED: batches written to the streaming MEMORY sink
  * (`WriteToDataSourceV2` roots). The memory sink is this harness's
  * result-materialization choice — result-sized by contract, the same
  * volume the driver's own dump reads — while production sinks
  * (parquet/WARC/kafka) write distributed; the engine's own
  * foreachBatch fold collects are ordinary actions and stay gated.
  * Residual blind spot, documented: a full collect of a table smaller
  * than the ceiling (sf0.001 documents = 500 rows) passes; the gate
  * exists for the corpus-scaling classes (pair streams, exploded
  * grams, lineitem-sized frames), and CollectAuditSpec's 50k fixture
  * pins that those flag.
  *
  * Queries are BUILT (which executes their internal collects and, for
  * streaming rows, their full micro-batch folds); the final frame is
  * not collected — that is the driver's own dump, not engine-internal
  * state. Set GRAFT_COLLECT_PRINT=1 to dump the per-query maxima
  * instead of asserting (the triage mode). */
class CollectBoundSpec extends AnyFunSuite with SparkTestBase {

  private val dir =
    sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private val printOnly = sys.env.contains("GRAFT_COLLECT_PRINT")

  /** Per-collect row ceiling — see class doc. */
  val Ceiling = 4500L

  /** CONTRACT-BOUNDED exemptions: collects bounded by a knob the
    * operator DECLARES and enforces loudly, rather than by the blanket
    * ceiling. Each entry names its cap and must have (a) a `require`
    * in the operator that fails loudly past it and (b) a scalable
    * alternative for the unbounded shape. Found by running this sweep
    * at sf0.1 (the gate's first real catch): q178's right side — the
    * purchase feature book StreamingAsof broadcasts as a per-key
    * sorted index — scales with the corpus in the REGISTRY fixture
    * (20k rows at sf0.1), while the operator's contract bounds it at
    * `maxIndexRows` (1 << 22, loud require) as every broadcast
    * dimension join does; table-vs-table as-of at corpus scale is
    * AsofJoin (q60) / the bucketed variant (its scaladoc says
    * exactly this). */
  val ContractBounded: Map[String, Long] = Map(
    "q178_streaming_asof" -> (1L << 22))

  test("every internal collect during query build is driver-bounded") {
    val offenders = Registry.all.flatMap { q =>
      val r = CollectAudit.start(spark)
      val built =
        try { q.run(spark, dir); None }
        catch { case scala.util.control.NonFatal(e) =>
          Some(s"${q.name}: <build failed: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}>")
        }
      val events = CollectAudit.stop(spark, r)
      if (printOnly) {
        val mx = events.map(_.rows).maxOption.getOrElse(0L)
        println(s"[collect-audit] ${q.name} n=${events.size} max=$mx" +
          (if (events.exists(_.rows < 0)) " UNKNOWN" else ""))
        events.filter(_.rows > 100).foreach(e =>
          println(s"[collect-audit]   ${q.name} ${e.funcName} " +
            s"rows=${e.rows} root=${e.rootNode}"))
      }
      val cap = ContractBounded.getOrElse(q.name, Ceiling)
      val gated =
        events.filter(_.rootNode != "WriteToDataSourceV2") // memory sink
      // two delivery classes (r17 verdict #8): a collect over the
      // ceiling is MEMORY-unbounded; a toLocalIterator is memory-
      // bounded but VOLUME-unbounded — it streams the whole frame
      // through the driver one partition at a time, so the row count
      // the audit sees is no bound at all. Neither belongs in an
      // engine build path.
      val bad = gated
        .filter(e => e.funcName == "toLocalIterator" ||
          e.rows > cap || e.rows < 0)
        .map(e =>
          if (e.funcName == "toLocalIterator")
            s"${q.name}: toLocalIterator rows=${e.rows} " +
              s"root=${e.rootNode} — volume-unbounded driver " +
              s"streaming (memory-bounded is not enough; collect a " +
              s"bounded frame or keep the work in the plan)"
          else s"${q.name}: ${e.funcName} rows=${e.rows} " +
            s"root=${e.rootNode}")
      built.toSeq ++ (if (printOnly) Nil else bad)
    }
    assert(offenders.isEmpty,
      s"\nDriver-unbounded internal collects (bound each by k/batch/" +
        s"compactBound or push the work into the plan):\n  " +
        offenders.mkString("\n  "))
  }
}
