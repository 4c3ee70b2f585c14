package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when a hot key
  * overwhelms one reducer and the small side is too big to broadcast
  * outright (AQE's skew-join split handles sort-merge joins; salting is
  * the portable technique and the one you reach for on deliberate
  * hot-key workloads like q38's).
  *
  * The big side gets a deterministic salt in [0, n) per ROW; the small
  * side is replicated n times (once per salt value), so every (key, salt)
  * pair finds its match and the hot key's rows spread across n reducers.
  * Cost: small side × n — choose n ≈ hot-key skew factor. */
object SkewJoin {

  /** @param saltCols columns whose hash spreads the hot key's rows —
    *   default: ALL of `big`'s columns. If the hot key's rows are
    *   bit-identical duplicates, a content hash stacks them on one
    *   (key, salt) reducer; pass a unique/high-cardinality column here
    *   (an event id, a payload) to restore the spread. */
  def salted(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // The salt must be DETERMINISTIC per row, not per row instance: a
    // nondeterministic salt (monotonic id / rand) feeds the shuffle join
    // key, and a map task retried after a fetch failure would re-salt its
    // rows differently — a row could land on a (key, salt) reducer
    // different from the one that already consumed its original
    // assignment, duplicating or dropping join rows under partial stage
    // retry. A content hash recomputes identically on every retry; its
    // price (identical rows share a salt) is the saltCols escape hatch
    // above.
    val spread = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val saltExpr = pmod(xxhash64(spread.map(big(_)): _*), lit(nSalts.toLong))
      .cast("int")
    val b = big.withColumn("__salt", saltExpr)
    val s = small.crossJoin(
      small.sparkSession.range(0, nSalts).select(col("id").cast("int").as("__salt")))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"))
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }
}
