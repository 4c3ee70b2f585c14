package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot management: what changed between two crawls/exports.
  * The recurring corpus-ops question ("which documents are new, gone, or
  * edited since the last snapshot?") answered with one keyed full-outer
  * join over content digests — both sides digest map-side (a fixed-width
  * hash per row crosses the exchange, never the payload), unchanged rows
  * are dropped BEFORE the result materializes, so the output is sized by
  * the churn, not the corpus. At 100 TB this is the standard
  * snapshot-reconciliation shape: one co-partitionable shuffle on the id,
  * no driver state. */
object Snapshots {

  /** Per-id change status between snapshots `a` (old) and `b` (new):
    * `added` (only in b), `removed` (only in a), `changed` (both, payload
    * digest differs). Unchanged ids are omitted. */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val ha = a.select(col(idCol), md5(col(payloadCol)).as("__ha"))
    val hb = b.select(col(idCol), md5(col(payloadCol)).as("__hb"))
    ha.join(hb, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ha").isNull, "added")
          .when(col("__hb").isNull, "removed")
          .when(col("__ha") =!= col("__hb"), "changed"))
      .where(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }
}
