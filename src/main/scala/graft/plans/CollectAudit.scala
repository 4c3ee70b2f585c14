package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CollectLimitExec, EmptyRelationExec, GlobalLimitExec, QueryExecution, SparkPlan, TakeOrderedAndProjectExec, UnionExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime audit of DRIVER-SIDE COLLECT VOLUME — the mechanization of
  * the engine's bounded-collect discipline (r16 verdict next-round #4:
  * the discipline was prose in scaladoc; like [[FpAudit]] did for FP
  * determinism, this turns it into a registry-wide gate).
  *
  * The rule it enforces: every `.collect()` a query performs while it
  * BUILDS (quantizer training, threshold tables, delta remaps,
  * streaming-fold state, prefix offsets) must return a driver-bounded
  * row count — bounded by k, batch size, compactBound, or another
  * corpus-independent knob — never a corpus-sized result. A
  * corpus-sized internal collect is the one defect class that works at
  * test scale and dies at 100 TB, which is exactly why it needs a
  * runtime gate rather than a code-review convention.
  *
  * Mechanism: a [[QueryExecutionListener]] records every
  * row-materializing action (`collect` / `collectAsList` /
  * `toLocalIterator`; `count`/`save` return scalars or write
  * distributed and are excluded) with the delivered row count read
  * from the executed plan's first `numOutputRows` metric in preorder —
  * the root when it carries one, else the nearest descendant (1:1
  * wrappers like Project/WholeStageCodegen carry none; the first
  * metric below them is the row count that flowed through). AQE roots
  * unwrap to their final plan. The listener bus is asynchronous, so
  * [[stop]] quiesces (polls until no event lands for `quietMs`) before
  * draining.
  *
  * CollectAuditSpec pins the mechanism on a deliberately-unbounded
  * fixture (a corpus-sized collect MUST flag) and on the bounded
  * shapes; CollectBoundSpec runs the whole registry under it. */
object CollectAudit {

  /** One driver-materializing action: the API entry point, the rows
    * it delivered (−1 when no plan node carried a row metric), and the
    * executed root node name for triage. */
  final case class CollectEvent(funcName: String, rows: Long,
      rootNode: String)

  private val CollectFuncs: Set[String] =
    Set("collect", "collectAsList", "collectToPython",
      "collectAsArrowToPython", "toLocalIterator")

  private def firstRows(p: SparkPlan): Option[Long] = p match {
    // AQE wrappers: the final plan hides behind leaf-node stages
    case a: AdaptiveSparkPlanExec => firstRows(a.executedPlan)
    case s: QueryStageExec => firstRows(s.plan)
    // AQE's propagate-empty rewrite replaces a provably-empty subtree
    // with a metric-less leaf — zero rows by construction
    case _: EmptyRelationExec => Some(0L)
    // limit roots carry no row metric but bound delivery by
    // construction: min(child rows, limit) is the delivered ceiling
    case t: TakeOrderedAndProjectExec =>
      Some(firstRows(t.child).fold(t.limit.toLong)(
        math.min(_, t.limit.toLong)))
    case c: CollectLimitExec =>
      Some(firstRows(c.child).fold(c.limit.toLong)(
        math.min(_, c.limit.toLong)))
    case g: GlobalLimitExec =>
      Some(firstRows(g.child).fold(g.limit.toLong)(
        math.min(_, g.limit.toLong)))
    case q =>
      q.metrics.get("numOutputRows").map(_.value)
        .orElse(q.children match {
          case collection.Seq() => None
          case collection.Seq(only) => firstRows(only)
          // a metric-less multi-child root delivers ALL branches: for
          // Union that is the branch sum (unknown if any branch is);
          // anything else is unmeasurable — report unknown so the gate
          // fails loudly rather than crediting only the first branch
          // (the r17 advisor's under-count)
          case many if q.isInstanceOf[UnionExec] =>
            val kids = many.map(firstRows)
            if (kids.forall(_.isDefined)) Some(kids.flatten.sum)
            else None
          case _ => None
        })
  }

  final class Recorder private[CollectAudit] ()
      extends QueryExecutionListener {
    private[CollectAudit] val events =
      new ConcurrentLinkedQueue[CollectEvent]
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      if (CollectFuncs(funcName))
        events.add(CollectEvent(funcName,
          firstRows(qe.executedPlan).getOrElse(-1L),
          qe.executedPlan.nodeName))
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Start recording collect actions on `spark`. */
  def start(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  /** Stop recording and return everything captured. The listener bus
    * is async: polls until the event stream is quiet for `quietMs`
    * (capped at `capMs`) before unregistering and draining. */
  def stop(spark: SparkSession, r: Recorder, quietMs: Long = 300,
      capMs: Long = 10000): Seq[CollectEvent] = {
    val deadline = System.nanoTime + capMs * 1000000L
    var last = -1
    var stableSince = System.nanoTime
    while (System.nanoTime < deadline &&
        (System.nanoTime - stableSince) < quietMs * 1000000L) {
      val n = r.events.size
      if (n != last) { last = n; stableSince = System.nanoTime }
      Thread.sleep(20)
    }
    spark.listenerManager.unregister(r)
    r.events.asScala.toSeq
  }

  /** Record the collect events `body` causes on `spark`. The recorder
    * unregisters on BOTH exits — a throwing body must not leak a live
    * listener onto the shared session. */
  def watching[T](spark: SparkSession)(body: => T)
      : (T, Seq[CollectEvent]) = {
    val r = start(spark)
    val out =
      try body
      catch { case t: Throwable =>
        spark.listenerManager.unregister(r)
        throw t
      }
    (out, stop(spark, r))
  }
}
