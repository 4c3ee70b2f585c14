package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped caches behind the query layer, with an explicit
  * lifecycle: intermediates that several queries share (the shingle table,
  * the LSH band table, the parsed alert stream) are cached once per
  * (session, sf-dir) and trained IVF centroids once per (session, dir,
  * config), and everything is released by [[evict]].
  *
  * Why this exists: in the bench/verify harness the process exits and the
  * caches die with it, but a long-lived session embedding this library
  * would otherwise accumulate pinned storage — `evict(session)` is the
  * contract for that embedding (call it when a scale-factor directory's
  * work is done). Entries key on the session by IDENTITY, so two sessions
  * over the same dir never share (or evict) each other's state. */
object Caches {

  private val frames =
    TrieMap.empty[(SparkSession, String, String), DataFrame]

  private val centroids =
    TrieMap.empty[(SparkSession, String, String), Array[(Int, Array[Double])]]

  private val pqBooks =
    TrieMap.empty[(SparkSession, String, String), Array[(Int, Int, Array[Double])]]

  private val memos =
    TrieMap.empty[(SparkSession, String, String), Any]

  /** The cached frame for `tag` over (session, dir), building (and
    * persisting) it on first use. `eager = true` materializes the
    * cache immediately (one `count()`), so downstream consumers pay only
    * their own work — the materialize-before-fan-out pattern.
    * `storage` defaults to `.cache()`'s MEMORY_AND_DISK; pass DISK_ONLY
    * for corpus-sized intermediates whose consumers are single-pass
    * aggregates — at real scale they should not evict the hot working
    * set from executor memory just to avoid a recompute. */
  def frame(s: SparkSession, dir: String, tag: String,
      eager: Boolean = false,
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)(
      build: => DataFrame): DataFrame =
    frames.getOrElseUpdate((s, dir, tag), {
      val df = build.persist(storage)
      if (eager) df.count()
      df
    })

  /** Trained coarse-quantizer centroids for `config` over (session, dir) —
    * training is deterministic, so every query sharing a configuration
    * reuses one training run (q65/q66/q67 pay the Lloyd iterations once). */
  def cells(s: SparkSession, dir: String, config: String)(
      build: => Array[(Int, Array[Double])]): Array[(Int, Array[Double])] =
    centroids.getOrElseUpdate((s, dir, config), build)

  /** Trained product-quantization codebooks `(sub, code, centroid)` for
    * `config` over (session, dir) — same deterministic-training lifecycle
    * as [[cells]] (q103/q104 pay the subspace Lloyd iterations once). */
  def pq(s: SparkSession, dir: String, config: String)(
      build: => Array[(Int, Int, Array[Double])])
      : Array[(Int, Int, Array[Double])] =
    pqBooks.getOrElseUpdate((s, dir, config), build)

  /** Arbitrary memoized value for `tag` over (session, dir) — the
    * lifecycle home for one-time side effects whose product is a small
    * HANDLE rather than a frame (the q185 bucketed-layout table names):
    * the side effect runs once per (session, dir), every later query in
    * the session reuses the handle, and [[evict]] drops the entry with
    * the rest of the session's state. */
  def memo[T](s: SparkSession, dir: String, tag: String)(build: => T): T =
    memos.getOrElseUpdate((s, dir, tag), build).asInstanceOf[T]

  /** Unpersist and drop every cache entry owned by `session`.
    *
    * Spark's CacheManager is PLAN-keyed and shared by every session of one
    * SparkContext, so two sessions that cached the same (dir, tag) share
    * one InMemoryRelation — a blind `unpersist()` here would silently drop
    * the other session's storage too. Storage is therefore released only
    * when no OTHER live session holds the same (dir, tag); the map entry
    * is dropped either way (tag names the computation, so same (dir, tag)
    * across sessions means a plan-equal frame). */
  def evict(session: SparkSession): Unit = {
    frames.keys.filter(_._1 eq session).foreach { case k @ (_, dir, tag) =>
      frames.remove(k).foreach { df =>
        val sharedElsewhere = frames.keys
          .exists { case (s2, d2, t2) =>
            (s2 ne session) && d2 == dir && t2 == tag
          }
        if (!sharedElsewhere)
          try df.unpersist() catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    centroids.keys.filter(_._1 eq session).foreach(centroids.remove)
    pqBooks.keys.filter(_._1 eq session).foreach(pqBooks.remove)
    memos.keys.filter(_._1 eq session).foreach(memos.remove)
  }

  /** Visible for tests: number of live entries for `session`. */
  private[graft] def liveEntries(session: SparkSession): Int =
    frames.keys.count(_._1 eq session) + centroids.keys.count(_._1 eq session) +
      pqBooks.keys.count(_._1 eq session) + memos.keys.count(_._1 eq session)
}
