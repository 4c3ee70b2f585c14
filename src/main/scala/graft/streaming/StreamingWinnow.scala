package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming winnowing (MOSS) near-duplicate candidates — the streaming
  * counterpart of q64's batch detector, completing the §7.6 streaming
  * family (exact dedup, LSH near-dup, sessions, winnowing).
  *
  * The batch detector equi-joins documents on shared winnowing
  * fingerprints. The streaming formulation keys the stream by FINGERPRINT
  * and keeps the doc_ids seen per fingerprint as standing state — exactly
  * [[StreamingNearDup.candidatePairs]]'s bounded-bucket contract, reused
  * verbatim with `bucket = fingerprint`: the state operator is
  * bucket-agnostic, so one implementation (and one overflow accumulator)
  * serves both sketch families. `maxBucket` is the streaming analog of the
  * batch DF cap: a boilerplate fingerprint shared by hundreds of documents
  * stops accumulating state at the bound instead of exploding the pair
  * fan-out quadratically.
  *
  * Like the batch path, candidates feed a downstream verify (uncapped
  * shared-fingerprint containment) — the streamed set is at-least-once and
  * equals the batch fingerprint-collision pair set exactly while every
  * fingerprint's bucket stays below `maxBucket` (StreamingWinnowSpec pins
  * both the equality and the bounded-overflow divergence). */
object StreamingWinnow {

  /** (bucket = fingerprint, docId) rows from a (doc_id, text) frame — the
    * SAME document-local fused fingerprint pass as the batch path
    * ([[graft.text.TextStats.winnowing]]), so stream and batch agree
    * bit-for-bit; a pure map stage, streamable with no shuffle before the
    * bucket exchange. */
  def fingerprintBuckets(docs: DataFrame, k: Int = 8, w: Int = 4)
      : Dataset[StreamingNearDup.BucketDoc] = {
    import docs.sparkSession.implicits._
    graft.text.TextStats.winnowing(docs, k = k, w = w)
      .select(col("doc_id").as("docId"),
        explode(col("fingerprints").cast("array<string>")).as("bucket"))
      .as[StreamingNearDup.BucketDoc]
  }

  /** Streamed candidate pairs over fingerprint buckets — delegates to the
    * shared bounded-bucket state operator (including its `idleTtl` state
    * bound; see [[StreamingNearDup.candidatePairs]]). */
  def candidatePairs(buckets: Dataset[StreamingNearDup.BucketDoc],
      maxBucket: Int = 20,
      idleTtl: Option[java.time.Duration] = None)
      : Dataset[StreamingNearDup.CandPair] =
    StreamingNearDup.candidatePairs(buckets, maxBucket, idleTtl)
}
