package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-recurrence scans over keyed, time-ordered data — the EWMA /
  * exponential-decay family every monitoring and feature pipeline needs
  * (`e_i = α·x_i + (1−α)·e_{i−1}`, seeded `e_1 = x_1`), computed EXACTLY
  * with bounded floating-point range and no per-row sequential UDF.
  *
  * Why not the obvious forms:
  *  - a per-key `collect_list` + fold holds the whole series per key in
  *    one task's memory — dead at 100 TB;
  *  - the closed form `e_i = Σ m^{i−j} c_j = m^i · Σ c_j m^{−j}` turns
  *    the recurrence into one windowed running sum, but `m^{−j}`
  *    overflows double range after a few hundred rows (0.8^−1000 ≈
  *    10^97).
  *
  * The fix is the standard SEGMENTED-SCAN factoring: split each key's
  * series into fixed blocks of `block` rows; inside a block the closed
  * form is safe (exponents bounded by `block−1`), and the carry across
  * blocks is itself the same linear recurrence over one row per block
  * (`E_b = L_b + m^{sz_b}·E_{b−1}`), evaluated per key over the tiny
  * block spine. Cost: one shuffle on the key, two ordered window passes
  * (row_number + running sum), one spine aggregation (n/block rows per
  * key), one broadcast-sized join back. Per-row state is O(1); the only
  * sequential work is the spine fold, `n/block` steps per key (recurse
  * the same factoring if a single key ever exceeds that — the math
  * composes).
  *
  * Skew behaves like any keyed window: a hot key is one big sorted run,
  * never a cross product.
  */
object Recurrence {

  /** Adds column `ewma` to `df`: the exponentially weighted moving
    * average of `valueCol` per `keyCols` group in `orderCols` order
    * (`e_1 = x_1`, `e_i = α·x_i + (1−α)·e_{i−1}`).
    *
    * `block` bounds the in-block exponent: the largest rescale factor is
    * `(1−α)^−(block−1)`, guarded below to keep the running sum well
    * inside double range (precision loss is ~1e−16 × the factor; the
    * default 32-row block with α ≥ 0.05 keeps absolute error under
    * ~1e−10 — callers gating on rounded values are safe by orders of
    * magnitude). */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      valueCol: String, alpha: Double, block: Int = 32): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"Recurrence.ewma: alpha must be in (0,1), got $alpha")
    require(block >= 1, s"Recurrence.ewma: block must be >= 1, got $block")
    val m = 1.0 - alpha
    val maxScale = math.pow(m, -(block - 1).toDouble)
    require(maxScale < 1e12,
      s"Recurrence.ewma: (1-alpha)^-(block-1) = $maxScale exceeds the " +
        "precision guard (1e12); shrink block for this alpha")

    val key = keyCols.map(col)
    val wRn = Window.partitionBy(key: _*).orderBy(orderCols: _*)
    val base = df
      .withColumn("__rn", row_number().over(wRn) - lit(1))
      .withColumn("__blk", (col("__rn") / lit(block)).cast("long"))
      .withColumn("__jl", (col("__rn") % lit(block)).cast("int"))
      // c_i: the recurrence's per-row input (seed row enters whole)
      .withColumn("__c",
        when(col("__rn") === 0, col(valueCol))
          .otherwise(lit(alpha) * col(valueCol)))

    // within-block closed form: local_i = m^jl · Σ_{j≤i} c_j · m^−jl_j
    val wBlk = Window.partitionBy((key :+ col("__blk")): _*)
      .orderBy(col("__rn").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("__u", col("__c") * pow(lit(m), -col("__jl")))
      .withColumn("__local", pow(lit(m), col("__jl")) * sum(col("__u")).over(wBlk))

    // block spine: L_b = local at the block's last row, sz_b = its rows;
    // fold E_b = L_b + m^sz_b · E_{b−1} per key (E_{−1} = 0 — the first
    // block has no carry), keeping every prefix so each block can read
    // its PREVIOUS block's final value.
    val spine = local
      .groupBy((key :+ col("__blk")): _*)
      .agg(max_by(col("__local"), col("__rn")).as("__L"),
        count(lit(1)).cast("int").as("__sz"))
      .groupBy(key: _*)
      .agg(sort_array(collect_list(struct(col("__blk"), col("__L"),
        col("__sz")))).as("__bs"))
      .select((key :+
        posexplode(col("__bs")).as(Seq("__p", "__b")) :+
        expr(
          s"""aggregate(__bs, array(cast(0.0 as double)),
             |  (acc, b) -> acc || array(b.__L +
             |    power(${m}D, cast(b.__sz as double)) *
             |      element_at(acc, -1)))""".stripMargin).as("__es")): _*)
      .select((key :+ col("__b.__blk").as("__blk") :+
        element_at(col("__es"), col("__p") + lit(1)).as("__eprev")): _*)

    // e_i = local_i + m^(jl+1) · E_{b−1}
    local
      .join(spine, keyCols :+ "__blk")
      .withColumn("ewma",
        col("__local") +
          pow(lit(m), col("__jl") + lit(1)) * col("__eprev"))
      .drop("__rn", "__blk", "__jl", "__c", "__u", "__local", "__eprev")
  }
}
