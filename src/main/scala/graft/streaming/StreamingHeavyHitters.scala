package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: sharded SpaceSaving (Metwally et al. 2005)
  * under `flatMapGroupsWithState` — the bounded-state streaming
  * counterpart of the exact batch top-k (q73) and the CMS estimates
  * (q79).
  *
  * Each token hashes to ONE shard (a deterministic function of the
  * token, so a token's whole count lives in a single shard's summary —
  * no cross-shard merge exists); each shard keeps at most `k` counters.
  * On arrival: tracked → increment; free slot → adopt; else the MINIMUM
  * counter is evicted and its count adopted as the newcomer's error
  * bound. Total state is `nShards × k` counters regardless of stream
  * length or vocabulary — the contract unbounded `groupBy(token).count`
  * state cannot give.
  *
  * SpaceSaving guarantees, per shard with `n` processed tokens:
  * `true ≤ est ≤ true + err`, `err ≤ n/k`, and every token with true
  * shard count > n/k is IN the summary (no false negatives above the
  * threshold). StreamingHeavyHittersSpec checks all three against batch
  * exact counts.
  *
  * Emitted each micro-batch (Update mode): the shard's full current
  * summary stamped with its processed count `nProcessed` — monotonically
  * increasing, so a consumer keeps each shard's max-`nProcessed`
  * generation as the current answer.
  */
object StreamingHeavyHitters {

  final case class Tok(shard: Int, token: String)
  final case class HH(shard: Int, nProcessed: Long, token: String,
      est: Long, err: Long)
  final case class SSState(n: Long, toks: Array[String],
      counts: Array[Long], errs: Array[Long])

  /** Deterministic token → shard assignment — `pmod(xxhash64(token), n)`,
    * computed through the SAME Spark-internal hash the codegen'd SQL
    * expression uses (seed 42), so a query can shard with the native
    * column function and this typed side provably agrees (the sharded
    * SpaceSaving guarantee needs a token's whole count in one shard).
    * [[shardCol]] is that SQL side; StreamingHeavyHittersSpec's
    * shard-agreement test pins the equality. */
  def shardOf(token: String, nShards: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(token),
      org.apache.spark.sql.types.StringType, 42L)
    val m = (h % nShards).toInt
    if (m < 0) m + nShards else m
  }

  /** The codegen'd column twin of [[shardOf]]. */
  def shardCol(token: org.apache.spark.sql.Column,
      nShards: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(token), lit(nShards.toLong)).cast("int")
  }

  def heavyHitters(tokens: Dataset[Tok], k: Int): Dataset[HH] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(_.shard)
      .flatMapGroupsWithState[SSState, HH](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard, rows, state: GroupState[SSState]) =>
          val st = state.getOption.getOrElse(
            SSState(0L, Array.empty, Array.empty, Array.empty))
          var n = st.n
          val toks = scala.collection.mutable.ArrayBuffer(
            st.toks.toIndexedSeq: _*)
          val counts = scala.collection.mutable.ArrayBuffer(
            st.counts.toIndexedSeq: _*)
          val errs = scala.collection.mutable.ArrayBuffer(
            st.errs.toIndexedSeq: _*)
          // hot-loop indexes, rebuilt from the persisted arrays once per
          // micro-batch: token → slot for O(1) hits, count → slots for
          // O(log k) min-eviction — the naive linear indexOf + min scan
          // is O(k) PER ARRIVING TOKEN, which at k = 10⁴ makes the
          // operator's hot loop 10⁴× slower than the structure it mirrors
          // (Metwally's Stream-Summary is O(1) amortized)
          val idx = scala.collection.mutable.HashMap.empty[String, Int]
          toks.indices.foreach(i => idx(toks(i)) = i)
          val buckets =
            scala.collection.mutable.TreeMap.empty[Long, scala.collection.mutable.Set[Int]]
          toks.indices.foreach(i =>
            buckets.getOrElseUpdate(counts(i),
              scala.collection.mutable.Set.empty[Int]) += i)
          def moveBucket(i: Int, to: Long): Unit = {
            val from = counts(i)
            buckets.get(from).foreach { s =>
              s -= i
              if (s.isEmpty) buckets.remove(from)
            }
            counts(i) = to
            buckets.getOrElseUpdate(to,
              scala.collection.mutable.Set.empty[Int]) += i
          }
          rows.foreach { t =>
            n += 1
            idx.get(t.token) match {
              case Some(i) => moveBucket(i, counts(i) + 1)
              case None if toks.length < k =>
                toks += t.token; counts += 1L; errs += 0L
                val i = toks.length - 1
                idx(t.token) = i
                buckets.getOrElseUpdate(1L,
                  scala.collection.mutable.Set.empty[Int]) += i
              case None =>
                // Evict A minimum counter; its count bounds the error.
                // WHICH member of the minimum bucket is evicted is
                // arbitrary by design: all counters in the bucket share
                // the same count, and SpaceSaving's guarantees (err ≤
                // evicted count; any item with true frequency > n/k is
                // retained) only require replacing SOME minimal counter —
                // the choice cannot affect the bounds, only which
                // equally-uncertain label is forgotten.
                val m = buckets.head._2.head
                val floor = counts(m)
                idx.remove(toks(m))
                idx(t.token) = m
                toks(m) = t.token
                errs(m) = floor
                moveBucket(m, floor + 1)
            }
          }
          state.update(SSState(n, toks.toArray, counts.toArray, errs.toArray))
          toks.indices.iterator
            .map(i => HH(shard, n, toks(i), counts(i), errs(i)))
      }
  }
}
