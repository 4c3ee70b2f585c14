package graft.measures

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** All six window statistics as one value. */
case class MeasureSet(mean: Double, median: Double, q10: Double,
    tailMean: Double, sm1: Double, sm2: Double)

/** One-pass six-measure typed Aggregator — the direct Spark analog of the
  * reference's Flink `AggregateFunction` SamplesAggregate
  * (StreamingJob.java:393-417): zero/reduce/merge/finish ≙
  * createAccumulator/add/merge/getResult — with a working `merge` (the
  * reference's was a stub legal only at parallelism 1, SURVEY §2.5 Q2).
  *
  * The engine's primary path derives measures from one shared sorted array
  * via Catalyst expressions (SURVEY §7.2) — codegen'd and oracle-matched;
  * this Aggregator is the custom-UDAF alternative for typed consumers and a
  * coverage proof that Flink-style UDAFs map 1:1 onto Spark Aggregators.
  */
class WindowMeasuresAgg(n: Int)
    extends Aggregator[Double, List[Double], MeasureSet] {
  override def zero: List[Double] = Nil
  override def reduce(b: List[Double], x: Double): List[Double] = x :: b
  override def merge(a: List[Double], b: List[Double]): List[Double] = a ++ b
  override def finish(b: List[Double]): MeasureSet = {
    // WindowExec evaluates the aggregate on every frame, including partial
    // ones at partition start; the reference only reads full windows
    // (callers gate on row_number ≥ n), so any frame SMALLER than the
    // declared window size yields NaNs — a fixed lower guard would let
    // partial frames of, say, 10..n−1 rows return plausible-looking but
    // wrong "full-window" statistics to a caller that forgot the gate.
    if (b.length < n) MeasureSet(Double.NaN, Double.NaN, Double.NaN,
      Double.NaN, Double.NaN, Double.NaN)
    else {
      val m = MeasuresRef.all(b.toArray).toMap
      MeasureSet(m(Measures.Mean), m(Measures.Median), m(Measures.Q10),
        m(Measures.TailMean), m(Measures.Sm1), m(Measures.Sm2))
    }
  }
  override def bufferEncoder: Encoder[List[Double]] =
    Encoders.kryo[List[Double]]
  override def outputEncoder: Encoder[MeasureSet] =
    Encoders.product[MeasureSet]
}

object WindowMeasuresAgg {
  /** Column form: `measures_agg(x)` usable in groupBy().agg and over
    * window frames; `n` is the window size partial frames are judged
    * against.
    *
    * CONTRACT: any group/frame with FEWER than `n` rows yields all-NaN —
    * the full-window gate (StreamingJob.java:139-142). `n` is REQUIRED
    * (no default since round 7): with a defaulted n=30, a groupBy
    * consumer aggregating legitimate 10..29-row groups silently got
    * all-NaN results; forcing the caller to state the expected group
    * size makes the partial-frame contract visible at every call site. */
  def column(x: Column, n: Int): Column =
    udaf(new WindowMeasuresAgg(n)).apply(x)
}
