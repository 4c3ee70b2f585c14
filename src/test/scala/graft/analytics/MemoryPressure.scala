package graft.analytics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness (not a test): the exact-computation premium
  * queries under a CONSTRAINED heap — the behavior that decides survival
  * on a busy cluster is spill-not-OOM, and every elasticity row so far ran
  * with 128 GiB of headroom. Run with `SPARK_DRIVER_MEM=4g` (build.sbt
  * passes it to the forked JVM's -Xmx) and default
  * `spark.memory.fraction`:
  *
  *   sbt "Test/runMain graft.analytics.MemoryPressure /root/testdata/sf0.1"
  *
  * Probes: q183 (exact per-column NDV + octiles — the documented
  * exact-vs-sketch calibration twin and the likeliest OOM candidate),
  * q184 (exact-threshold PPJoin), q191 (rare-bigram-blocked fuzzy
  * linkage), and the 10x MinHash-LSH path from ScaleElasticity (50k
  * hash-generated docs — the banded-join machinery under memory
  * pressure). Per-probe output: wall seconds plus cumulative
  * memoryBytesSpilled / diskBytesSpilled from stage-level task metrics —
  * nonzero spill with completion is the PASS signal under a heap this
  * size; OOM is the failure this harness exists to catch.
  */
object MemoryPressure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // LSH corpus scale (x5000 docs) and partition count: raising the
    // first and lowering the second grows the PER-TASK working set until
    // the sorts/aggregations must spill — the knob that turns "fits
    // anyway" into the actual spill-not-OOM measurement
    val lshScale = if (args.length > 1) args(1).toInt else 10
    val partitions = if (args.length > 2) args(2) else "16"
    // optional execution-memory squeeze (default Spark 0.6): the registry
    // paths stream per-partition and genuinely do not need corpus-
    // proportional execution memory, so demonstrating the SPILL path
    // takes both a corpus-sized sort probe and a small pool
    val memFraction = if (args.length > 3) args(3) else "0.6"
    val spark = SparkSession.builder()
      .master(s"local[$partitions]")
      .appName("graft-memory-pressure")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.memory.fraction", memFraction)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[mem] heap max ${Runtime.getRuntime.maxMemory() / 1048576} MB")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        memSpill.addAndGet(s.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpill.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })

    def probe(name: String)(work: => Unit): Unit = {
      // listener events are async (and the bus drain API is
      // private[spark]): a short settle pause before each snapshot keeps
      // the per-probe attribution honest for a dev harness
      Thread.sleep(1500)
      val (m0, d0) = (memSpill.get, diskSpill.get)
      val t0 = System.nanoTime()
      try {
        work
        Thread.sleep(1500)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[mem] $name%-18s OK    $wall%7.1f s  " +
          f"spill mem ${(memSpill.get - m0) / 1048576.0}%9.1f MB  " +
          f"disk ${(diskSpill.get - d0) / 1048576.0}%9.1f MB")
      } catch { case t: Throwable =>
        println(s"[mem] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
        throw t
      }
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the three exact-premium registry queries, forced through noop
    for (qn <- Seq("q183_column_stats", "q184_ppjoin_exact",
        "q191_fuzzy_linkage")) {
      val q = graft.queries.Registry.byName(qn)
      probe(qn)(force(q.run(spark, sfDir)))
    }

    // the LSH path at `lshScale`x: ScaleElasticity's corpus shape
    // (5000*scale docs of 100-300 vocab-5000 words, ~3% planted exact
    // dups), full shingle -> minhash -> band -> candidate -> verify chain
    val base = java.nio.file.Files
      .createTempDirectory("graft_mempressure").toString
    val docsPath = s"$base/docs_lsh"
    val bodyOf = (id: org.apache.spark.sql.Column) => concat_ws(" ",
      transform(sequence(lit(1), lit(100) + pmod(xxhash64(id), lit(200))),
        i => concat(lit("w"), pmod(xxhash64(id * 1000 + i), lit(5000)))))
    spark.range(5000L * lshScale).select(col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(10))).as("source"),
      when(col("id") % 31 === 0 && col("id") >= 31,
        bodyOf(col("id") - 31)).otherwise(bodyOf(col("id"))).as("text"))
      .write.mode("overwrite").parquet(docsPath)
    probe(s"minhash_lsh_${lshScale}x") {
      val grams = graft.dedup.Dedup.shingles(spark.read.parquet(docsPath))
      val cands = graft.dedup.Dedup.lshCandidates(
        graft.dedup.Dedup.minhashBands(grams))
      force(graft.dedup.Dedup.jaccardVerify(cands, grams)
        .where(col("jaccard") >= 0.8))
    }

    // the spill-class control: a global sort of the corpus-sized gram
    // table — the operator shape that CANNOT stream (range-partitioned
    // UnsafeExternalSorter holds each partition's run) and therefore must
    // spill-not-OOM once the run outgrows its execution-memory share;
    // also proves the harness's spill counters actually see spill
    probe("gram_global_sort") {
      force(graft.dedup.Dedup.shingles(spark.read.parquet(docsPath))
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .orderBy(col("gram"), col("doc_id")))
    }

    // The STREAMING MAINTAINER fold loops under the same constrained
    // heap (the r16 verdict's next-round #5: the batch heavy paths were
    // probed at 2 GiB; the q216/q217-shaped loops were not). 24 folds
    // each on a 100k corpus, RocksDB state store, forcing compactBounds
    // so coalesce AND compaction boundaries land inside the probe; the
    // per-fold standing layers (localCheckpoint blocks + driver sets)
    // are the thing that would OOM a small heap if they weren't bounded.
    probe("mixed_cc_24folds") {
      val n = 100000L
      val nb = 24
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val hist = spark.range(n - 1).where((col("id") + 1) % 20 =!= 0)
        .select(col("id").as("a"), (col("id") + 1).as("b")).persist()
      try {
        val labels = graft.analytics.Graphs.connectedComponents(ids, hist)
          .localCheckpoint()
        val adds = spark.range(n / 20 - 1)
          .where(pmod(xxhash64(col("id")), lit(50)) === 0)
          .select(lit("add").as("op"), (col("id") * 20 + 19).as("a"),
            ((col("id") + 1) * 20).as("b"))
        val rms = spark.range(n)
          .where(pmod(xxhash64(col("id") + 7), lit(2000)) === 0)
          .select(lit("rm").as("op"), col("id").as("a"), lit(-1L).as("b"))
        val ops = adds.unionAll(rms).withColumn("__b",
          pmod(xxhash64(col("a"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$base/mixed_in")
        graft.streaming.StateBackend.withRocksDb(spark) {
          force(graft.streaming.StreamingCcMixed.maintain(
            spark.readStream.schema("op STRING, a BIGINT, b BIGINT")
              .option("maxFilesPerTrigger", "1")
              .parquet(s"$base/mixed_in"),
            labels, hist, ids, s"$base/mixed_ckpt", compactBound = 10))
        }
      } finally hist.unpersist()
    }
    probe("index_maint_24folds") {
      val n = 100000L
      val nb = 24
      val histM = spark.range(n).select(
        concat(lit("k"), (col("id") / 5)).as("k"), col("id").as("doc_id"))
        .persist()
      try {
        val index = histM.groupBy(col("k"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
        val adds = spark.range(n / 100)
          .select(lit("add").as("op"), (col("id") + n).as("doc_id"),
            concat(lit("k"), pmod(xxhash64(col("id")), lit(n / 5)))
              .as("text"))
        val rms = spark.range(n)
          .where(pmod(xxhash64(col("id") + 3), lit(n / 500)) === 0)
          .select(lit("rm").as("op"), col("id").as("doc_id"),
            lit(null).cast("string").as("text"))
        val ops = adds.unionAll(rms).withColumn("__b",
          pmod(xxhash64(col("doc_id"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$base/idxm_in")
        graft.streaming.StateBackend.withRocksDb(spark) {
          force(graft.streaming.StreamingIndexMaint.maintain(
            spark.readStream
              .schema("op STRING, doc_id BIGINT, text STRING")
              .option("maxFilesPerTrigger", "1")
              .parquet(s"$base/idxm_in"),
            index, histM, s"$base/idxm_ckpt", keyCol = "k",
            docCol = "doc_id", orderCols = Seq("doc_id"),
            mkMembers = b => b.select(col("text").as("k"),
              col("doc_id")),
            compactBound = 25))
        }
      } finally histM.unpersist()
    }

    println(f"[mem] TOTAL spill: mem ${memSpill.get / 1048576.0}%.1f MB, " +
      f"disk ${diskSpill.get / 1048576.0}%.1f MB — completed, no OOM")
    spark.stop()
  }
}
