package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection.
  *
  * The batch path (q27/q28) computes per-document band keys and self-joins
  * on (band, band_key). Streams can't self-join their own history, so the
  * standing-state formulation is: key the stream by LSH bucket and keep the
  * doc_ids seen per bucket; each arriving document emits one candidate pair
  * per earlier bucket member. Bucket state is exactly the batch join's
  * build side, sharded by the same key — at scale each bucket holds a
  * handful of ids (hot buckets are the same problem the batch DF-cap
  * handles; `maxBucket` bounds them here).
  *
  * The signature is computed DOCUMENT-LOCALLY (the same fused native
  * [[graft.functions.MinHashSlots]] pass as the batch path): a pure map
  * over the stream, no shuffle before the bucket exchange.
  */
object StreamingNearDup {

  final case class BucketDoc(bucket: String, docId: Long)
  final case class CandPair(docA: Long, docB: Long)

  /** (doc_id, bucket) rows from a (doc_id, text) frame; bucket =
    * band index + band key — the SAME document-local sketch as the batch
    * path ([[graft.dedup.Dedup.minhashBands]]), so stream and batch agree
    * bit-for-bit.
    *
    * Gram-less docs (< 3 tokens — they'd all share the empty
    * signature) are dropped HERE on the cheap token-count predicate, and
    * the minhash layer is told so (`assumeNonEmpty`): its own
    * size(grams)>0 guard is the expensive-pushdown trap a stream cannot
    * cache its way out of — the predicate's shingling expression would
    * re-evaluate serially at the single-split scan (see
    * [[graft.dedup.Dedup.minhashSignature]]; 15 of q113's 16 s). */
  def bandKeys(docs: DataFrame, k: Int = 12, rowsPerBand: Int = 3): DataFrame =
    graft.dedup.Dedup.minhashBands(
      graft.dedup.Dedup.shingles(
        docs.where(size(graft.dedup.Dedup.tokens(col("text"))) >= 3)),
      k = k, rowsPerBand = rowsPerBand, assumeNonEmpty = true)
      .select(col("doc_id"),
        concat(col("band").cast("string"), lit(":"), col("band_key"))
          .as("bucket"))

  /** Candidate near-dup pairs (docA < docB), streamed: one pair per
    * (new doc, earlier doc) sharing a bucket. Pairs can repeat across
    * buckets (batch dedups with DISTINCT; a streaming consumer dedups
    * downstream or tolerates at-least-once candidates).
    *
    * Equality with the batch self-join holds only while every bucket stays
    * BELOW `maxBucket` members: once a bucket overflows, later arrivals
    * still pair against the stored members but are not themselves stored,
    * so two post-overflow documents sharing ONLY that bucket are never
    * paired. That is the deliberate hot-bucket bound (the streaming analog
    * of the batch DF-cap, which drops hot shingles entirely); overflow is
    * counted in the `graft.neardup.bucketOverflow` accumulator so an
    * operator can see when the cap was hit rather than discovering missing
    * candidates downstream.
    *
    * `maxBucket` bounds each bucket but NOT the bucket count: with no TTL
    * a lifetime stream retains one state entry per distinct bucket ever
    * observed — mostly singletons that can never pair again — and the
    * state store grows with the fingerprint vocabulary. `idleTtl` is the
    * lever for long-lived deployments: buckets idle past it are dropped
    * (processing-time timeout), trading away pairs that straddle an idle
    * gap longer than the TTL — the standard streaming-dedup window
    * contract, stated instead of silent. Default keeps the unbounded
    * exact behavior for the batch-equality specs. */
  def candidatePairs(banded: Dataset[BucketDoc],
      maxBucket: Int = 64,
      idleTtl: Option[java.time.Duration] = None): Dataset[CandPair] = {
    import banded.sparkSession.implicits._
    val overflow = banded.sparkSession.sparkContext
      .longAccumulator("graft.neardup.bucketOverflow")
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, timeoutConf) {
        (_, rows, state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Array.empty[Long])
            val pairs = scala.collection.mutable.ArrayBuffer.empty[CandPair]
            rows.foreach { r =>
              if (!seen.contains(r.docId)) {
                seen.foreach { prev =>
                  val (a, b) =
                    if (prev < r.docId) (prev, r.docId) else (r.docId, prev)
                  pairs += CandPair(a, b)
                }
                if (seen.length < maxBucket) seen = seen :+ r.docId
                else overflow.add(1)
              }
            }
            state.update(seen)
            idleTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            pairs.iterator
          }
      }
  }
}
