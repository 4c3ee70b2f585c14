package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DoubleType

/** Stream-static as-of attachment — the feature-SERVING shape of
  * [[graft.analytics.AsofJoin]]: every streamed row looks up the latest
  * static right-side value at or before its timestamp, from a per-key
  * ts-sorted index that rides a broadcast.
  *
  * Contract: the right side is a BOUNDED artifact relative to the stream
  * (a feature table, a config history, a price book) — the same
  * smallness assumption every broadcast dimension join makes, enforced
  * loudly by `maxIndexRows`. The lookup itself is a pure per-partition
  * map (binary search per row, no shuffle, no state store), so it runs
  * identically over a batch frame or a streaming one in append mode —
  * the spec proves batch equality with AsofJoin.asof, and the gated
  * query proves the streamed output hash-matches the batch oracle. */
object StreamingAsof {

  /** Append `outCol` (nullable DOUBLE) to `df`: the latest `valueCol`
    * from `right` with `right.tsCol <= df.tsCol` for the row's `keyCol`
    * (long key, long timestamps — the event-stream shape). Rows keyed
    * before any right row, or to an unseen key, get NULL. */
  def attach(df: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String,
      maxIndexRows: Int = 1 << 22): DataFrame = {
    val rows = right
      .select(col(keyCol).cast("long"), col(tsCol).cast("long"),
        col(valueCol).cast("double"))
      .collect()
    require(rows.length <= maxIndexRows,
      s"StreamingAsof: right side has ${rows.length} rows, past the " +
        s"$maxIndexRows broadcast-index bound — this is the SERVING " +
        "shape; use AsofJoin for table-vs-table joins")
    val idx: Map[Long, (Array[Long], Array[Double])] = rows
      .groupBy(_.getLong(0))
      .map { case (k, g) =>
        val sorted = g.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
        k -> ((sorted.map(_._1), sorted.map(_._2)))
      }
    val bc = df.sparkSession.sparkContext.broadcast(idx)
    val outSchema = df.schema.add(outCol, DoubleType, nullable = true)
    df.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        val k = r.getAs[Number](keyCol).longValue()
        val t = r.getAs[Number](tsCol).longValue()
        val v: Any = m.get(k) match {
          case Some((ts, vs)) =>
            // rightmost i with ts(i) <= t
            var lo = 0
            var hi = ts.length - 1
            var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (ts(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0) Double.box(vs(ans)) else null
          case None => null
        }
        Row.fromSeq(r.toSeq :+ v)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
