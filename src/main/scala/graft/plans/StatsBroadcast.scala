package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Session-independent registry of collected table statistics — the
  * ANALYZE surface q183 computes, stored where the optimizer rule
  * [[StatsBroadcastRule]] can reach it: per parquet path, row count, an
  * estimated row width, and per-column exact NDV + equi-depth octile
  * bounds.
  *
  * Why this exists: without cost-based optimization (off by default),
  * Spark estimates a `Filter` at its CHILD's full size — a 0.1%-selective
  * predicate on a 100 GB fact table still "weighs" 100 GB at planning
  * time, so the join above it sort-merges both sides through a full
  * shuffle even though the filtered side would fit in one broadcast.
  * At 100 TB that is the difference between shuffling the corpus and
  * shipping a few MB to every executor. Collected statistics close the
  * gap: equality shrinks by 1/NDV, ranges by the octile-histogram
  * fraction — the same estimates a warehouse CBO uses.
  */
object TableStats {

  /** Exact column profile: distinct count + 9 equi-depth bounds
    * (min, 7 inner octiles, max). */
  final case class ColHist(ndv: Long, bounds: Array[Double])

  final case class Stats(rows: Long, rowBytes: Long,
      cols: Map[String, ColHist])

  private val reg = new ConcurrentHashMap[String, Stats]()

  private def norm(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def register(path: String, s: Stats): Unit = reg.put(norm(path), s)
  def clear(): Unit = reg.clear()
  def isEmpty: Boolean = reg.isEmpty
  def lookup(path: String): Option[Stats] = Option(reg.get(norm(path)))

  /** ONE melted pass over `df` collecting row count plus exact
    * NDV + octiles for each named numeric column, registered under
    * `path`. Exact percentiles/NDV are the right call at ANALYZE time
    * for bounded tables; q70/q43 document the mergeable-sketch forms
    * that replace them when the profiled table itself is corpus-sized.
    *
    * The stats come from [[graft.analytics.Percentiles.profile]] over a
    * `stack` melt (bit-identical to the previous
    * percentile()+count_distinct aggregate — PercentilesSpec): the
    * single-group percentile buffer held one value-multiset hash map
    * PER PARTITION and merged them single-threaded, which made the q190
    * ANALYZE pass cost ~3 s at sf0.1 on l_orderkey's 150k NDV. Columns
    * are cast to DOUBLE in the melt (the profile needs one value type);
    * exact for integral values up to 2^53 — beyond that, profile the
    * column with the q70 sketch instead. */
  def analyze(df: DataFrame, path: String, cols: Seq[String]): Stats = {
    val qs = Seq(0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0)
    val melt = df.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") +
        ") AS (__col, __v)"))
    val prof = graft.analytics.Percentiles
      .profile(melt, "__col", "__v", qs)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), qs.indices.map(i => r.getDouble(5 + i)).toArray))
      .toMap
    val colStats = cols.map { c =>
      val (ndv, bounds) = prof(c)
      c -> ColHist(ndv, bounds)
    }.toMap
    // row count exactly as before (count(lit(1)): all rows, nulls
    // included — the profile's __n drops nulls); a zero-column count
    // scan is footer-cheap next to the melt pass
    val row = df.groupBy().agg(count(lit(1)).as("__n")).head()
    // static row-width estimate from the schema; the stats drive a
    // broadcast-or-not decision, where being within 2x is plenty
    val rowBytes = df.schema.map(_.dataType.defaultSize.toLong).sum
    val s = Stats(row.getAs[Long]("__n"), rowBytes, colStats)
    register(path, s)
    s
  }
}

/** Statistics-driven broadcast planning — the engine's `Rule[LogicalPlan]`
  * surface, injected through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`), running inside Catalyst's operator-optimization
  * batch.
  *
  * For every un-hinted equi-join it estimates each side bottom-up from
  * [[TableStats]]: a single-path parquet scan anchors the walk at the
  * registered row count; `Filter` multiplies in a selectivity derived
  * from the collected stats (equality → 1/NDV, ranges → interpolated
  * octile fraction, AND → product, OR → capped sum, unknown → 1.0 so
  * estimates only ever shrink when the stats justify it); `Project` /
  * aliases pass through; anything else — aggregates, joins, unions —
  * aborts the walk and leaves the join untouched. A side whose estimated
  * bytes fit under the threshold gets a BROADCAST hint on exactly the
  * join sides its join type allows (inner: either; left outer/semi/anti:
  * right only; right outer: left only), and Spark's planner does the
  * rest.
  *
  * The rule is a strict no-op until someone registers statistics
  * ([[TableStats.analyze]] — the q190 gate query does), and can be
  * disabled per session with `spark.graft.statsBroadcastJoin.enabled`.
  * Idempotent by construction: it only touches `JoinHint.NONE` joins,
  * so the fixed-point batch applies it once per join.
  */
final case class StatsBroadcastRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.statsBroadcastJoin.enabled", "true") == "true"

  private def threshold: Long =
    spark.conf.get("spark.graft.statsBroadcastJoin.threshold",
      (10L * 1024 * 1024).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (TableStats.isEmpty || !enabled) plan
    else plan.transformUp {
      case j @ Join(l, r, jt, _, JoinHint.NONE) =>
        val thr = threshold
        val canLeft = jt match {
          case Inner | RightOuter => true
          case _ => false
        }
        val canRight = jt match {
          case Inner | LeftOuter | LeftSemi | LeftAnti => true
          case _ => false
        }
        val lh =
          if (canLeft && estBytes(l).exists(_ <= thr))
            Some(HintInfo(Some(BROADCAST)))
          else None
        val rh =
          if (canRight && estBytes(r).exists(_ <= thr))
            Some(HintInfo(Some(BROADCAST)))
          else None
        if (lh.isEmpty && rh.isEmpty) j
        else j.copy(hint = JoinHint(lh, rh))
    }

  private def estBytes(p: LogicalPlan): Option[Double] =
    estimate(p).map { case (rows, s) => rows * s.rowBytes }

  /** (estimated rows, base-table stats) for plans the walk understands. */
  private def estimate(p: LogicalPlan)
      : Option[(Double, TableStats.Stats)] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.toSeq match {
        case Seq(single) =>
          TableStats.lookup(single.toUri.getPath)
            .map(s => (s.rows.toDouble, s))
        case _ => None
      }
      case _ => None
    }
    case Filter(cond, child) =>
      estimate(child).map { case (n, s) => (n * selectivity(cond, s), s) }
    case Project(_, child) => estimate(child)
    case SubqueryAlias(_, child) => estimate(child)
    case _ => None
  }

  private def litNum(e: Expression): Option[Double] = e match {
    case Literal(v, _) => v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case _ => None
    }
    case c: Cast => litNum(c.child)
    case _ => None
  }

  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast => attrOf(c.child)
    case _ => None
  }

  /** Fraction of rows at or below `v` per the equi-depth octile bounds:
    * each of the 8 buckets holds 1/8 of the rows; linear interpolation
    * inside the bucket `v` lands in. */
  private[plans] def histFraction(bounds: Array[Double], v: Double)
      : Double = {
    if (v < bounds.head) 0.0
    else if (v >= bounds.last) 1.0
    else {
      val i = bounds.lastIndexWhere(_ <= v, bounds.length - 2)
      val lo = bounds(i)
      val hi = bounds(i + 1)
      val within = if (hi > lo) (v - lo) / (hi - lo) else 1.0
      ((i + within) / (bounds.length - 1)).min(1.0).max(0.0)
    }
  }

  private def colSel(e1: Expression, e2: Expression,
      s: TableStats.Stats)(f: (ColStatsView, Double) => Double)
      : Double = {
    val direct = for {
      a <- attrOf(e1); v <- litNum(e2); h <- s.cols.get(a)
    } yield f(ColStatsView(h, flipped = false), v)
    val flip = for {
      a <- attrOf(e2); v <- litNum(e1); h <- s.cols.get(a)
    } yield f(ColStatsView(h, flipped = true), v)
    direct.orElse(flip).getOrElse(1.0)
  }

  private case class ColStatsView(h: TableStats.ColHist, flipped: Boolean)

  private def selectivity(c: Expression, s: TableStats.Stats): Double =
    c match {
      case And(a, b) => selectivity(a, s) * selectivity(b, s)
      case Or(a, b) =>
        (selectivity(a, s) + selectivity(b, s)).min(1.0)
      case Not(a) => (1.0 - selectivity(a, s)).max(0.0)
      case _: IsNotNull => 1.0
      case EqualTo(l, r) =>
        colSel(l, r, s)((v, _) => if (v.h.ndv > 0) 1.0 / v.h.ndv else 1.0)
      case LessThan(l, r) =>
        colSel(l, r, s)((v, x) =>
          if (!v.flipped) histFraction(v.h.bounds, x)
          else 1.0 - histFraction(v.h.bounds, x))
      case LessThanOrEqual(l, r) =>
        colSel(l, r, s)((v, x) =>
          if (!v.flipped) histFraction(v.h.bounds, x)
          else 1.0 - histFraction(v.h.bounds, x))
      case GreaterThan(l, r) =>
        colSel(l, r, s)((v, x) =>
          if (!v.flipped) 1.0 - histFraction(v.h.bounds, x)
          else histFraction(v.h.bounds, x))
      case GreaterThanOrEqual(l, r) =>
        colSel(l, r, s)((v, x) =>
          if (!v.flipped) 1.0 - histFraction(v.h.bounds, x)
          else histFraction(v.h.bounds, x))
      case _ => 1.0
    }
}
