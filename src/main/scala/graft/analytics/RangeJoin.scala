package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to the intervals containing
  * them — via BUCKETED equi-join, the scalable form of a predicate Spark
  * would otherwise plan as a per-key nested loop (`p BETWEEN lo AND hi`
  * is a theta-join: at 100 TB a broadcast saves it only while the
  * interval side is small, and a shuffled theta-join is a cross product
  * per key).
  *
  * The standard trick: pick a bucket width W, explode every interval to
  * the integer buckets it overlaps (⌊lo/W⌋ … ⌊hi/W⌋ — an interval of
  * length L lands in ≤ L/W + 2 buckets), bucket every point once
  * (⌊p/W⌋), equi-join on (keys…, bucket), and re-verify the exact bounds
  * on the candidates. Each (point, interval) pair can meet in at most
  * the point's single bucket, so matches are exact with NO dedup stage.
  * Cost knobs: W ≈ the typical interval length makes the explode factor
  * ~2 and the candidate joins tight; the verify predicate is codegen'd
  * and drops false bucket-mates for free. */
object RangeJoin {

  /** Join `points` (carrying `pointCol`, a LONG) to `intervals`
    * (carrying LONG `loCol`/`hiCol`, inclusive bounds) on containment
    * lo ≤ p ≤ hi, equi-matching any shared `keyCols` first. Returns the
    * point columns plus the interval columns (names must not collide
    * apart from `keyCols`). `bucket` is W above: intervals explode into
    * (hi−lo)/W + 1 bucket rows, so pick it near the typical interval
    * length. Malformed intervals (hi < lo) fail LOUDLY rather than
    * silently matching nothing. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, bucket: Long,
      keyCols: Seq[String] = Seq.empty): DataFrame = {
    require(bucket >= 1, s"RangeJoin: bucket width must be >= 1, got $bucket")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"RangeJoin: non-key column collision ${overlap.mkString(", ")}")
    def b(c: Column): Column = floor(c / lit(bucket)).cast("long")
    val lo = col(loCol)
    val hiGuarded = when(col(hiCol) >= lo, col(hiCol))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval with $hiCol < $loCol at $loCol="),
        lo.cast("string"))))
    val iv = intervals
      .withColumn("__bkt",
        explode(sequence(b(lo), b(hiGuarded))))
    val pt = points.withColumn("__bkt", b(col(pointCol)))
    pt.join(iv, keyCols :+ "__bkt")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bkt")
  }
}
