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

  def salted(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    // the salt round-robins per row INSTANCE (monotonic id), never by row
    // CONTENT: hashing the row would give identical rows identical salts,
    // and hot keys are routinely made of repeated identical events — a
    // content hash would land them all on one (key, salt) reducer and
    // mitigate nothing. The join RESULT is salt-invariant (every (key,
    // salt) still finds the replicated small side), so the salt needs no
    // cross-retry determinism — only spread.
    val saltExpr = pmod(monotonically_increasing_id(), lit(nSalts.toLong))
      .cast("int")
    val b = big.withColumn("__salt", saltExpr)
    val s = small.crossJoin(
      small.sparkSession.range(0, nSalts).select(col("id").cast("int").as("__salt")))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"))
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }
}
