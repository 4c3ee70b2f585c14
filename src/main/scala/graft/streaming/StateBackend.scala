package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the stateful streaming family.
  *
  * Spark's default `HDFSBackedStateStoreProvider` keeps EVERY key's state
  * as JVM-heap objects on the executors (the loaded version map), so
  * operators whose state grows with the corpus — delta-dedup's
  * one-digest-per-novel-document map (q145), sharded SpaceSaving summaries
  * (q114) — eventually turn executor heaps into the scale ceiling: GC
  * pressure first, OOM at 100 TB stream lifetimes. Spark 4 ships
  * `RocksDBStateStoreProvider` in-box: state lives in native RocksDB
  * (off-heap block cache + on-disk SST files, snapshot/changelog uploads
  * to the checkpoint), so per-executor state is disk-bounded, not
  * heap-bounded, and micro-batch cost tracks the BATCH's touched keys,
  * not the store's total size.
  *
  * [[useRocksDb]] flips a session to the RocksDB provider (idempotent,
  * same value from every caller — safe under concurrent sessions). The
  * provider class is captured per-query at `start()` and recorded in the
  * checkpoint, so restarts keep the backend they started with;
  * `CheckpointRestartSpec`/`DeltaDedupRestartSpec`/`EwmaRestartSpec` pin
  * restart-across-the-provider behavior, and `StateScale` measures state
  * growth staying off-heap through 100× novel-key volume.
  */
object StateBackend {
  val ProviderConfKey = "spark.sql.streaming.stateStore.providerClass"
  val ChangelogConfKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route this session's stateful streaming queries onto RocksDB.
    * Changelog checkpointing uploads per-batch deltas instead of full
    * SST snapshots — the production setting for large state; correctness
    * is identical (the restart specs run against exactly this config). */
  def useRocksDb(spark: SparkSession): Unit = {
    spark.conf.set(ProviderConfKey, RocksDbProvider)
    spark.conf.set(ChangelogConfKey, "true")
  }

  /** Run `body` with the RocksDB provider active, then RESTORE the
    * session's previous backend confs. The provider class is captured
    * per-query at `start()`, so a stream started inside `body` keeps
    * RocksDB for its whole life; restoring afterwards just stops the
    * session-wide conf from leaking into later stateful streams an
    * embedding session starts on its own (the r14 ADVICE finding — the
    * restart specs previously had to unset the keys by hand). */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prior = Seq(ProviderConfKey, ChangelogConfKey)
      .map(k => k -> spark.conf.getOption(k))
    useRocksDb(spark)
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
