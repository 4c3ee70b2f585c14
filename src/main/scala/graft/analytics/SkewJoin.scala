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

  /** @param saltCols REQUIRED: columns whose content hash spreads the hot
    *   key's rows — pass a unique or high-cardinality column (an event id,
    *   a payload). There is deliberately NO whole-row default: the
    *   operator's canonical workload is a hot key made of repeated,
    *   near-identical rows, and a whole-row hash gives every duplicate the
    *   same salt — the entire hot key lands back on one (key, salt)
    *   reducer and the mitigation silently does nothing. To opt into
    *   whole-row hashing anyway (rows known distinct), pass
    *   `big.columns.toSeq` explicitly. */
  def salted(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int, saltCols: Seq[String]): DataFrame = {
    require(saltCols.nonEmpty,
      "SkewJoin.salted: saltCols must name at least one spread column " +
        "(a unique/high-cardinality column; pass big.columns.toSeq to " +
        "opt into whole-row hashing)")
    // The salt must be DETERMINISTIC per row, not per row instance: a
    // nondeterministic salt (monotonic id / rand) feeds the shuffle join
    // key, and a map task retried after a fetch failure would re-salt its
    // rows differently — a row could land on a (key, salt) reducer
    // different from the one that already consumed its original
    // assignment, duplicating or dropping join rows under partial stage
    // retry. A content hash recomputes identically on every retry; its
    // price (identical saltCols values share a salt) is why saltCols must
    // be chosen by the caller.
    val saltExpr = pmod(xxhash64(saltCols.map(big(_)): _*), lit(nSalts.toLong))
      .cast("int")
    val b = big.withColumn("__salt", saltExpr)
    val s = small.crossJoin(
      small.sparkSession.range(0, nSalts).select(col("id").cast("int").as("__salt")))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"))
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }
}
