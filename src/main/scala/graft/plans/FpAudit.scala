package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union}
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
  * A guard only counts when it actually quantizes away the reorder error:
  * `round(e, k)` (or a cast to `DECIMAL(p, k)`) guards iff `k <= MaxGuardScale`
  * (6 — the repo convention; the reorder error of a plan-order double sum is
  * ~1e-9 relative, so round(e, 6)'s 1e-6 quantum absorbs it with >= 100x
  * margin for values up to ~10 and >= 1x up to ~1e3 — the magnitude envelope
  * of the registry's guarded aggregates, which are rates/ratios/scores —
  * while `round(e, 12)` leaves no margin at any magnitude and would be
  * guarded in name only). A round with a non-literal or finer scale is
  * transparent: the audit descends through it as if it were not there.
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
  * Two formerly documented blind spots are now closed: (1) `Union` output
  * attributes reuse only the FIRST child's exprIds, so the audit maps every
  * union output attribute onto the matching column of EVERY branch and flags
  * if any branch's definition is unsafe; (2) subquery expressions
  * (`ScalarSubquery`, `ListQuery`, `Exists`, lateral) carry their own plans
  * outside `plan.children`, so alias definitions are collected from
  * `subqueriesAll` too and a `SubqueryExpression` node descends into its
  * plan's output.
  */
object FpAudit {

  /** Largest round/decimal scale accepted as a determinism guard: quantizing
    * at <= 6 fractional digits absorbs double-sum reorder error (~1e-9
    * relative) with margin; finer "guards" are transparent to the audit. */
  val MaxGuardScale = 6

  /** Fractional output columns of `df` whose value depends on aggregation
    * order (empty = FP-deterministic vs an oracle re-computation). */
  def audit(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    // The main plan plus every subquery plan, recursively — subquery plans
    // are expression-borne and invisible to plan.collect.
    val allPlans: Seq[LogicalPlan] = plan +: plan.subqueriesAll

    // exprId -> defining expressions, across every node of every plan tree
    // (Project.projectList, Aggregate.aggregateExpressions,
    // Window.windowExpressions all surface through `expressions`). A key can
    // have SEVERAL definitions: a Union output attribute borrows the first
    // child's exprId but is fed by the matching column of every branch, and
    // the audit must hold for all of them.
    val aliasDefs = allPlans.flatMap(_.collect { case node =>
      node.expressions.flatMap(_.collect { case a: Alias =>
        a.exprId.id -> (a.child: Expression)
      })
    }.flatten)
    val unionDefs = allPlans.flatMap(_.collect { case u: Union =>
      u.children.flatMap(c => u.output.zip(c.output).map {
        case (out, branch) => out.exprId.id -> (branch: Expression)
      })
    }.flatten)
    val defs: Map[Long, Seq[Expression]] =
      (aliasDefs ++ unionDefs).groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).distinct
      }

    def isFrac(dt: DataType): Boolean = dt == DoubleType || dt == FloatType

    def orderSensitive(af: AggregateFunction): Boolean = af match {
      case s: Sum      => isFrac(s.child.dataType)
      case a: Average  => isFrac(a.child.dataType)
      case _: CentralMomentAgg => true
      case _: Corr | _: Covariance => true
      case _ => false
    }

    // Does this round/cast scale actually quantize? (see MaxGuardScale)
    def guards(scale: Int): Boolean = scale <= MaxGuardScale

    def unsafe(e: Expression, seen: Set[Long]): Boolean = e match {
      case r: RoundBase => r.right match {
        case Literal(s: Int, _) if guards(s) => false // genuine quantization
        case _ => unsafe(r.left, seen) // transparent: scale too fine or dynamic
      }
      case c: Cast if c.dataType.isInstanceOf[DecimalType] =>
        if (guards(c.dataType.asInstanceOf[DecimalType].scale)) false
        else c.children.exists(unsafe(_, seen)) // DECIMAL(38,18)-style: no margin
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
      case sq: SubqueryExpression =>
        // the subquery's value is its plan's output — resolve those
        // attributes through defs (collected above from subqueriesAll);
        // outer-reference arguments are checked as ordinary children
        sq.plan.output.exists(unsafe(_, seen)) ||
          sq.children.exists(unsafe(_, seen))
      case ar: AttributeReference =>
        defs.get(ar.exprId.id) match {
          case Some(ds) if !seen(ar.exprId.id) =>
            ds.exists(unsafe(_, seen + ar.exprId.id))
          case _ => false
        }
      case other => other.children.exists(unsafe(_, seen))
    }

    plan.output.filter(a => isFrac(a.dataType) && unsafe(a, Set.empty))
      .map(_.name)
  }
}
