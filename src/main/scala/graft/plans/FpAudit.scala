package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/** Floating-point determinism audit for oracle-hashed query outputs.
  *
  * The failure class (seen live as q185's round-11 red): a double `sum`/`avg`
  * is order-sensitive — Spark's partial/final aggregation sums partitions in
  * an order that depends on the physical plan (bucketed SMJ vs plain join,
  * AQE-coalesced exchanges, partition count), while the DuckDB oracle sums in
  * its own order. Both are "correct" to ~1 ulp-per-add, but the driver gate
  * hash-compares exact bit patterns, so any plan change can flip a green row
  * red. The repo convention (q12/q38/q84/q185) is `round(sum(…), k)` applied
  * identically on the engine and oracle sides: the residual risk is a value
  * landing within the reorder error (~1e-9 relative) of a half-ulp-of-round
  * boundary, which quantization makes astronomically unlikely rather than
  * plan-dependent.
  *
  * This object mechanizes the sweep: [[audit]] walks a query's *analyzed*
  * logical plan, resolves every fractional (float/double) output column
  * through alias chains (Project / Aggregate / Window nodes), and reports the
  * columns whose defining expression contains an order-sensitive aggregate —
  * Sum or Average over fractional input, any central moment (stddev/var/
  * skewness/kurtosis), Corr or Covariance — that is NOT guarded by a
  * `round`/`bround`/cast-to-decimal strictly above it in the expression tree.
  *
  * Sums over integral or decimal inputs are exact and order-independent, so
  * they never flag. A `round` BELOW the aggregate (`sum(round(x, 2))`) does
  * not guard and still flags. WindowExpressions with an ORDER BY are NOT
  * flagged: WindowExec sorts the partition then folds frames sequentially,
  * so the summation order is fixed by the sort, not the plan — deterministic
  * as long as the sort key is tie-free (registry windows order by unique
  * event/doc ids; tie-freeness is a per-query review obligation, not
  * plan-provable). An ORDER-BY-less window aggregate DOES flag: the frame
  * is the whole partition buffered in shuffle-arrival order.
  *
  * Known limitation: `Union` output attributes alias only the FIRST child's
  * columns, so later branches are reached only through that child's exprIds;
  * a later-branch-only aggregate could hide. The registry's unions are
  * count-typed, so this is theoretical — noted for honesty.
  */
object FpAudit {

  /** Fractional output columns of `df` whose value depends on aggregation
    * order (empty = FP-deterministic vs an oracle re-computation). */
  def audit(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    // exprId -> defining expression, across every node of the plan tree
    // (Project.projectList, Aggregate.aggregateExpressions,
    // Window.windowExpressions all surface through `expressions`).
    val defs: Map[Long, Expression] = plan.collect { case node =>
      node.expressions.flatMap(_.collect { case a: Alias => a.exprId.id -> a.child })
    }.flatten.toMap

    def isFrac(dt: DataType): Boolean = dt == DoubleType || dt == FloatType

    def orderSensitive(af: AggregateFunction): Boolean = af match {
      case s: Sum      => isFrac(s.child.dataType)
      case a: Average  => isFrac(a.child.dataType)
      case _: CentralMomentAgg => true
      case _: Corr | _: Covariance => true
      case _ => false
    }

    def unsafe(e: Expression, seen: Set[Long]): Boolean = e match {
      case _: RoundBase => false // round/bround above the agg: guarded
      case c: Cast if c.dataType.isInstanceOf[DecimalType] => false // quantized
      case w: WindowExpression if w.windowSpec.orderSpec.nonEmpty =>
        // sorted-frame sequential fold: the FOLD's order is fixed by the
        // sort, not the plan — but its INPUTS may still be plan-order-
        // dependent doubles (an unrounded upstream aggregate feeding a
        // cumulative window), so descend into the window function's
        // children while exempting only the fold itself
        val inputUnsafe = w.windowFunction match {
          case ae: AggregateExpression =>
            ae.aggregateFunction.children.exists(unsafe(_, seen))
          case f => f.children.exists(unsafe(_, seen))
        }
        inputUnsafe ||
          w.windowSpec.partitionSpec.exists(unsafe(_, seen)) ||
          w.windowSpec.orderSpec.exists(o => unsafe(o.child, seen))
      case ae: AggregateExpression =>
        orderSensitive(ae.aggregateFunction) ||
          ae.aggregateFunction.children.exists(unsafe(_, seen))
      case ar: AttributeReference =>
        defs.get(ar.exprId.id) match {
          case Some(d) if !seen(ar.exprId.id) => unsafe(d, seen + ar.exprId.id)
          case _ => false
        }
      case other => other.children.exists(unsafe(_, seen))
    }

    plan.output.filter(a => isFrac(a.dataType) && unsafe(a, Set.empty))
      .map(_.name)
  }
}
