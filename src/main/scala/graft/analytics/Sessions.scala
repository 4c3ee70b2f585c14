package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap sessionization as a library operator — the batch analog of
  * streaming session windows (see StreamingSessionSpec for the
  * `session_window` parity). Everything shards by `keyCol`; no global
  * order exists anywhere. */
object Sessions {

  /** Adds a `sess` column: 1-based session index per key, where a new
    * session starts when the seq gap to the previous row exceeds `gap`. */
  def sessionize(df: DataFrame, keyCol: String, seqCol: String,
      gap: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val delta = col(seqCol) - lag(col(seqCol), 1).over(byKey)
    df.withColumn("__brk",
        when(delta.isNull || (delta > gap), 1).otherwise(0))
      .withColumn("sess", sum(col("__brk")).over(byKey))
      .drop("__brk")
  }

  /** Per-key session summary: n_sessions, max_sess_len, n_events. */
  def sessionStats(df: DataFrame, keyCol: String, seqCol: String,
      gap: Long): DataFrame =
    sessionize(df.select(col(keyCol), col(seqCol)), keyCol, seqCol, gap)
      .groupBy(col(keyCol), col("sess"))
      .agg(count(lit(1)).as("sess_len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("sess_len")).as("max_sess_len"),
        sum(col("sess_len")).cast("long").as("n_events"))
}
