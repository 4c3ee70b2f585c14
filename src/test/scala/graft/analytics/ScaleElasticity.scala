package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity

/** Dev measurement harness (not a test): wall-clock SCALING of the dedup
  * and ANN headline paths, 1× vs 10× corpora generated from the same
  * deterministic shapes — the empirical point behind PLANS.md's 100 TB
  * design claims. Everything is generated with hash-seeded Spark
  * expressions (distributed, no driver loops), written to parquet, and
  * read back so each timed run includes the scan. ANN cell count scales
  * WITH the corpus (constant expected occupancy ~250, the documented
  * production rule) — holding k fixed while data grows 10× would grow
  * within-cell join work 100× and measure a misconfiguration, not the
  * engine. Usage: sbt "Test/runMain graft.analytics.ScaleElasticity"
  */
object ScaleElasticity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-elasticity")
      // GraftExtensions carries StatsBroadcastRule for the stats_rule
      // probes; the rule is inert unless TableStats.analyze registered
      // stats for a scanned path, so other probes are unaffected
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("graft_elasticity").toString

    /** documents(n): ~sf0.1-shaped corpus — doc_id, source (10), text of
      * 100–300 vocab-5000 words, all hash-derived from doc_id; every
      * 31st doc is an EXACT copy of the doc 31 ids earlier (planted dup
      * rate ~3%, so exact/passage dedup do real work at both scales). */
    def genDocs(n: Long, path: String): Unit = {
      val body = (id: org.apache.spark.sql.Column) => concat_ws(" ",
        transform(sequence(lit(1), lit(100) + pmod(xxhash64(id), lit(200))),
          i => concat(lit("w"), pmod(xxhash64(id * 1000 + i), lit(5000)))))
      spark.range(n).select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(10))).as("source"),
        when(col("id") % 31 === 0 && col("id") >= 31,
          body(col("id") - 31)).otherwise(body(col("id"))).as("text"))
        .write.mode("overwrite").parquet(path)
    }

    /** embeddings(n): 64-dim, 50 planted clusters — centers and noise
      * both hash-derived, round-6 (the testdata's shape). */
    def genEmb(n: Long, path: String): Unit = {
      def u(seed: org.apache.spark.sql.Column) =
        (pmod(xxhash64(seed), lit(1000000)).cast("double") / 1e6) - 0.5
      val c = pmod(col("id"), lit(50))
      val e = transform(sequence(lit(1), lit(64)), i =>
        round(u(concat(lit("c"), c * 100 + i)) +
          u(concat(lit("v"), col("id") * 100 + i)) * lit(0.3), 6))
      spark.range(n).select(col("id").as("vec_id"), e.as("e"))
        .write.mode("overwrite").parquet(path)
    }

    def time(name: String, scale: String)(work: => Unit): Double = {
      val t0 = System.nanoTime()
      work
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[elast] $name%-22s $scale%-4s $s%7.1f s")
      s
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[Double]]
    def run(name: String, times: Seq[Double]): Unit = {
      results(name) = times
      println(f"[elast] $name%-22s ratio ${times.last / times.head}%5.2f×")
    }

    // scale tags: default 1x/10x; a second arg like "1x,30x" or "30x"
    // adds the >10× points (corpus sizes scale with the tag — 30x = 150k
    // docs / 60k vectors; ANN cells and PQ sample fraction follow the
    // same occupancy rules)
    val tags: Seq[String] = if (args.length > 1)
      args(1).split(",").toSeq else Seq("1x", "10x")
    def scaleOf(tag: String): Int = tag.stripSuffix("x").toInt
    for (tag <- tags) {
      genDocs(5000L * scaleOf(tag), s"$base/docs_$tag")
      genEmb(2000L * scaleOf(tag), s"$base/emb_$tag")
    }
    def docs(tag: String) = spark.read.parquet(s"$base/docs_$tag")
    def emb(tag: String) = spark.read.parquet(s"$base/emb_$tag")

    // exact dedup: normalized-digest keep-first (q20/q116's stage shape)
    def exactDedup(tag: String): Unit = {
      val d = docs(tag).withColumn("dig",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      val first = d.groupBy("dig").agg(min("doc_id").as("doc_id"))
      force(d.join(first, Seq("dig", "doc_id")))
    }
    // MinHash-LSH near-dup: shingle → bands → candidates → verify (q28)
    def lsh(tag: String): Unit = {
      val grams = Dedup.shingles(docs(tag))
      val cands = Dedup.lshCandidates(Dedup.minhashBands(grams))
      force(Dedup.jaccardVerify(cands, grams)
        .where(col("jaccard") >= 0.8))
    }
    // decomposition probe: signature+banding ALONE (no candidate join, no
    // verify) — isolates what the integer minwise rewrite changed from
    // the candidate/verify stages that dominate the full path
    def lshBandsOnly(tag: String): Unit =
      force(Dedup.minhashBands(Dedup.shingles(docs(tag))))
    // through the candidate self-join + distinct, no verify
    def lshCandsOnly(tag: String): Unit =
      force(Dedup.lshCandidates(
        Dedup.minhashBands(Dedup.shingles(docs(tag)))))
    // passage-grain dedup over 32-token chunks (q108)
    def passage(tag: String): Unit = {
      val units = graft.text.TextStats
        .chunk(docs(tag), size = 32, stride = 32)
        .select(col("doc_id"), col("chunk_id"),
          concat_ws(" ", col("ctoks")).as("unit"))
      force(Dedup.dedupUnits(units, docCol = "doc_id",
        idxCol = "chunk_id", unitCol = "unit"))
    }
    // trained multi-probe IVF, cells ∝ n (constant occupancy ~250)
    def ann(tag: String, cells: Int): Unit = {
      val e = emb(tag)
      val cc = Similarity.trainCells(e, k = cells, iters = 2)
      force(Similarity.ivfMultiProbeTopK(e, cc, k = 3, probes = 4,
        assignProbes = 2))
    }
    // IVF-PQ ADC + exact refine at the q104 shape, cells ∝ n
    def pqadc(tag: String, cells: Int): Unit = {
      val e = emb(tag)
      val cc = Similarity.trainCells(e, k = cells, iters = 2)
      val pq = Similarity.trainPq(e, m = 8, ksub = 16, iters = 2,
        sampleFraction = math.min(1.0, 1.0 / scaleOf(tag)))
      force(Similarity.pqAdcRefineTopK(e, cc, pq, m = 8, k = 3,
        shortlist = 64, probes = 4, assignProbes = 2))
    }

    // round-10 additions ------------------------------------------------
    // spectral PCA: the corpus-sized stage is the N×d² Gram product
    // accumulation; the 4 power-iteration rounds are d-sized
    def pca(tag: String): Unit = {
      val g = graft.similarity.Spectral
        .gramMatrix(emb(tag), eCol = "e")
        .persist()
      try force(graft.similarity.Spectral.topEigen(g, dim = 64, iters = 4))
      finally g.unpersist()
    }
    // NB classifier: train = one corpus token×class aggregation, apply =
    // (word,label)-keyed join + per-doc argmax
    def nb(tag: String): Unit =
      force(graft.text.Classify.naiveBayesPredict(docs(tag), "source"))
    // pagerank: node/edge counts ∝ corpus (10k/100k nodes, 100k/1M
    // edges, hash-derived) — per-iteration edge⋈rank join + keyed agg
    def pagerank(tag: String): Unit = {
      val (nodes, edges) =
        (10000L * scaleOf(tag), 100000L * scaleOf(tag))
      val e = spark.range(edges).select(
        pmod(xxhash64(col("id")), lit(nodes)).as("src"),
        pmod(xxhash64(col("id") * 7 + 1), lit(nodes)).as("dst"),
        (pmod(xxhash64(col("id") * 13 + 2), lit(100)) + 1)
          .cast("double").as("w"))
        .persist()
      try force(graft.analytics.Graphs.pageRank(e, iters = 3))
      finally e.unpersist()
    }

    // round-11 additions ------------------------------------------------
    // full-corpus Lloyd k-means, k FIXED (model size is its own knob —
    // production scales k with the corpus to bound cluster sizes, which
    // adds another ×10 of assignment work by design, not by engine
    // inefficiency): per round one pure-map assignment + a k·d exchange
    def kmeans(tag: String): Unit =
      force(graft.similarity.Clustering.lloyd(emb(tag), vecCol = "e",
        k = 16, rounds = 3))
    // incremental dedup: a 20%-of-corpus delta (half re-ingests = history
    // dups, half novel) against the history digest index
    def delta(tag: String): Unit = {
      val d = docs(tag)
      val batch = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .unionAll(d.where(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 2000000000L).as("doc_id"),
            concat(col("text"), lit(" novel"), col("doc_id")).as("text")))
      force(Dedup.dedupDelta(d, batch))
    }

    // compressed-codec decode (PNG encode+decode, GIF LZW encode+decode):
    // a pure map stage — the embarrassingly-parallel claim, measured
    def codecs(tag: String): Unit = {
      import spark.implicits._
      val n = 5000L * scaleOf(tag)
      val ids = spark.range(n).as[java.lang.Long].map(_.toLong)
      force(graft.ext.Multimodal.pngPixelStats(ids.map(d =>
        graft.ext.MediaFile(d, "image/png",
          graft.ext.Multimodal.syntheticPng(d)))).toDF)
      force(graft.ext.Multimodal.gifPixelStats(ids.map(d =>
        graft.ext.MediaFile(d, "image/gif",
          graft.ext.Gif.syntheticGif(d)))).toDF)
      // JPEG: encode (FDCT+quant+Huffman; every 5th-phase-1 progressive)
      // + full decode — the heaviest per-payload codec work
      force(graft.ext.Multimodal.jpegPixelStats(ids.map(d =>
        graft.ext.MediaFile(d, "image/jpeg",
          graft.ext.Jpeg.syntheticJpeg(d)))).toDF)
    }

    // round-11 additions ------------------------------------------------
    // connected components: random sparse graph (near-dup-shaped shallow
    // components) under BOTH engines, and a single deep chain under star
    // contraction alone (propagation's rounds = the chain length — it has
    // no measurable point there, which IS the point)
    def ccGraph(tag: String): (DataFrame, DataFrame) = {
      val nodes = 50000L * scaleOf(tag)
      val ids = spark.range(nodes).select(col("id").as("doc_id"))
      val edges = spark.range(30000L * scaleOf(tag)).select(
        pmod(xxhash64(col("id")), lit(nodes)).as("a"),
        pmod(xxhash64(col("id") * 7 + 3), lit(nodes)).as("b"))
      (ids, edges)
    }
    def ccStar(tag: String): Unit = {
      val (ids, edges) = ccGraph(tag)
      val (labels, rounds) =
        graft.analytics.Graphs.ccWithRounds(ids, edges, "doc_id", 60)
      force(labels)
      println(s"[elast]   cc_star_random $tag rounds=$rounds")
    }
    def ccProp(tag: String): Unit = {
      val (ids, edges) = ccGraph(tag)
      // 60 rounds is NOT enough here: even this subcritical random graph
      // grows a >60-diameter component, so propagation needs a 400-round
      // budget where star contraction used 7-8 — that asymmetry is the
      // measurement
      force(graft.dedup.Dedup.clusters(ids, edges, maxRounds = 400))
    }
    // incremental CC: same random graph as ccStar, 90/10 history/delta
    // edge split, history labels PRE-computed outside the timing (they
    // are the standing artifact) — the timed path is resolve-to-roots +
    // contracted-CC + broadcast relabel, the per-ingest-batch cost; the
    // comparison row is cc_star_random (the full recompute per batch)
    def ccDeltaProbe(tag: String): Unit = {
      val (ids, edges) = ccGraph(tag)
      val e = edges.withColumn("__d", pmod(xxhash64(col("a"), col("b")),
        lit(10)) === 0).persist()
      try {
        val labels = graft.analytics.Graphs
          .connectedComponents(ids, e.where(!col("__d"))
            .select(col("a"), col("b")))
          .persist()
        labels.count() // materialize OUTSIDE the timed region
        val t0 = System.nanoTime()
        force(graft.analytics.Graphs.ccDelta(labels,
          e.where(col("__d")).select(col("a"), col("b")), ids))
        println(f"[elast]   cc_delta_inc $tag inner " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (delta-only path)")
        labels.unpersist()
      } finally e.unpersist()
    }
    // DECREMENTAL CC (round 17): standing labels pre-computed outside
    // the inner timing; take down a hash-derived ~1% node slice — the
    // timed path is the affected-components repair (broadcast affected
    // set + retained-member re-solve); the comparison row is
    // cc_star_random, the full recompute a takedown would otherwise pay.
    // Two graph shapes, because the blast-radius bound is the whole
    // story: "clustered" is the near-dup PRODUCTION shape (many small
    // components — size-20 chains — so 1% of nodes touches ~1% of the
    // graph and repair cost tracks the touched slice), while "random"
    // is the adversarial bound (the subcritical random graph still
    // grows one large component, 1% removal almost surely touches it,
    // and affected-component repair honestly degenerates toward the
    // full recompute — the documented worst case, not a defect)
    def ccRetractProbe(tag: String, shape: String): Unit = {
      // removal slice: random keeps 1% (the adversarial bound wants the
      // giant component hit); clustered uses 0.01% — a realistic
      // takedown-batch fraction, where the blast-radius bound is the
      // win (1% would taint 20% of a size-20-component graph: every
      // removal drags its whole component into the repair set)
      val (ids, edges, denom) = if (shape == "random") {
        val (i, e) = ccGraph(tag); (i, e, 100L)
      } else {
        val n = 100000L * scaleOf(tag)
        (spark.range(n).select(col("id").as("doc_id")),
          spark.range(n - 1).where((col("id") + 1) % 20 =!= 0)
            .select(col("id").as("a"), (col("id") + 1).as("b")),
          10000L)
      }
      val e = edges.persist()
      try {
        val labels = graft.analytics.Graphs
          .connectedComponents(ids, e.select(col("a"), col("b")))
          .persist()
        labels.count() // materialize OUTSIDE the timed region
        val removed = ids
          .where(pmod(xxhash64(col("doc_id")), lit(denom)) === 0)
        val t0 = System.nanoTime()
        force(graft.analytics.Graphs.ccRetract(labels,
          e.select(col("a"), col("b")), removed))
        val repair = (System.nanoTime() - t0) / 1e9
        // the full recompute a takedown would otherwise pay, on the SAME
        // graph minus the removed nodes — the direct comparison
        val t1 = System.nanoTime()
        val keepIds = ids.join(removed
          .select(col("doc_id")), Seq("doc_id"), "left_anti")
        force(graft.analytics.Graphs.connectedComponents(keepIds,
          e.join(removed.select(col("doc_id").as("a")), Seq("a"), "left_anti")
            .join(removed.select(col("doc_id").as("b")), Seq("b"), "left_anti")
            .select(col("a"), col("b"))))
        val full = (System.nanoTime() - t1) / 1e9
        println(f"[elast]   cc_retract_$shape $tag inner repair " +
          f"$repair%.1f s vs full recompute $full%.1f s " +
          f"(${full / repair}%.1f× saved)")
        labels.unpersist()
      } finally e.unpersist()
    }
    // index DELETION (round 17): standing exact-dedup index pre-built
    // outside the inner timing; take down ~1% of docs — the timed path
    // is touched-digest re-election + untouched pass-through; the
    // comparison row is exact_dedup (the index rebuild)
    def dedupRetractProbe(tag: String): Unit = {
      val d = docs(tag).persist()
      try {
        val index = d
          .groupBy(md5(col("text")).as("text_hash"))
          .agg(min(col("doc_id")).as("canonical_id"),
            count(lit(1)).as("n_copies"))
          .persist()
        index.count() // materialize OUTSIDE the timed region
        val t0 = System.nanoTime()
        force(Dedup.dedupRetract(index, d,
          d.where(col("doc_id") % 100 === 0).select(col("doc_id"))))
        println(f"[elast]   dedup_retract $tag inner " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (repair-only path)")
        index.unpersist()
      } finally d.unpersist()
    }
    // ANN tombstone serving (round 17): quantizer + postings pre-built
    // outside the inner timing (FROZEN on deletion — that is the
    // contract); the timed path is tombstone-filtered serving, whose
    // cost should track ivf_multiprobe's SERVE portion with no rebuild
    // or retrain paid at all
    def ivfTombstoneProbe(tag: String, cells: Int): Unit = {
      val e = emb(tag).persist()
      try {
        val cc = Similarity.trainCells(e, k = cells, iters = 2)
        val postings = Similarity.assignCells(e, cc)
          .select(col("vec_id"), col("cell"), col("e")).persist()
        postings.count() // materialize OUTSIDE the timed region
        val tomb = e.where(pmod(xxhash64(col("vec_id")), lit(100)) === 0)
          .select(col("vec_id"))
        val t0 = System.nanoTime()
        force(Similarity.ivfTombstoneTopK(postings, cc, tomb,
          k = 3, probes = 4))
        println(f"[elast]   ivf_tombstone $tag inner " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (serve-only path)")
        postings.unpersist()
      } finally e.unpersist()
    }
    // MIXED streaming maintenance (round 16): per-batch wall must stay
    // FLAT across many folds on a fixed corpus — the r15 verdict's weak
    // row was the previous carrier's per-batch edge-frame accumulation
    // (every takedown repair unioned ALL added-edge frames, linear plan
    // growth in batch count) and its forever-driver-side tombstones.
    // 24 one-file batches of mixed add/remove ops over the clustered
    // production shape (size-20 chains; adds bridge adjacent chains,
    // removes drag their chain into the repair); the inner line reports
    // early-vs-late per-batch means (batch 0 excluded as warmup) —
    // flat ⟺ the standing layers are O(1) in batch count.
    /** Per-batch trigger durations of a streaming run, via the async
      * progress listener (shared by the maintainer fold probes). */
    def timedFolds(run: => Unit): Seq[Double] = {
      val durs = scala.collection.mutable.Map.empty[Long, Double]
      val listener =
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming
              .StreamingQueryListener.QueryProgressEvent): Unit =
            durs.synchronized {
              durs(e.progress.batchId) = e.progress.durationMs
                .get("triggerExecution").toDouble / 1000
            }
          override def onQueryTerminated(e: org.apache.spark.sql
            .streaming.StreamingQueryListener.QueryTerminatedEvent)
            : Unit = ()
        }
      spark.streams.addListener(listener)
      try {
        run
        Thread.sleep(2000) // progress events are async; let them drain
      } finally spark.streams.removeListener(listener)
      durs.synchronized(durs.toSeq.sortBy(_._1).map(_._2))
    }

    def reportFolds(name: String, tag: String, seq: Seq[Double]): Unit = {
      // guard short runs (r17 advisor): <10 recorded folds can't fill
      // both windows — print a partial line instead of NaN means
      val early = seq.slice(1, 9)
      val late = seq.takeRight(8)
      if (seq.size < 10 || early.isEmpty || late.isEmpty) {
        println(f"[elast]   $name $tag ${seq.size} folds — too few " +
          f"for an early/late split (sum ${seq.sum}%.2f s)")
        return
      }
      val em = early.sum / early.size
      val lm = late.sum / late.size
      println(f"[elast]   $name $tag ${seq.size} folds, " +
        f"per-batch early $em%.2f s -> late $lm%.2f s " +
        f"(${lm / em}%.2fx; flat <=> O(1) standing layers)")
    }

    /** STREAMING digest-index maintenance (q217's shape) over many
      * folds with a FORCING compactBound — the r16 verdict's
      * long-horizon ask: per-fold wall must stay flat past every
      * member-frame-cap coalesce and compaction boundary. Groups of 5
      * duplicate docs per digest; adds join existing digests (keeper
      * re-election does real work), removes hit keepers (handoff). */
    def indexMaintProbe(tag: String, nb: Int, compactBound: Int): Unit = {
      val n = 100000L * scaleOf(tag)
      val histM = spark.range(n).select(
        concat(lit("k"), (col("id") / 5)).as("k"), col("id").as("doc_id"))
        .persist()
      try {
        val index = histM.groupBy(col("k"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
        val dir = s"$base/idxm_${tag}_$nb"
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
            .write.mode("append").parquet(s"$dir/in")
        val seq = timedFolds {
          graft.streaming.StateBackend.withRocksDb(spark) {
            force(graft.streaming.StreamingIndexMaint.maintain(
              spark.readStream
                .schema("op STRING, doc_id BIGINT, text STRING")
                .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
              index, histM, s"$dir/_ckpt", keyCol = "k",
              docCol = "doc_id", orderCols = Seq("doc_id"),
              mkMembers = b => b.select(col("text").as("k"),
                col("doc_id")),
              compactBound = compactBound))
          }
        }
        reportFolds(s"index_maint($nb,cb=$compactBound)", tag, seq)
      } finally histM.unpersist()
    }

    def mixedMaintProbe(tag: String, nb: Int = 24,
        compactBound: Int = 10000): Unit = {
      val n = 100000L * scaleOf(tag)
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val hist = spark.range(n - 1).where((col("id") + 1) % 20 =!= 0)
        .select(col("id").as("a"), (col("id") + 1).as("b")).persist()
      try {
        val labels = graft.analytics.Graphs.connectedComponents(ids, hist)
          .localCheckpoint()
        val dir = s"$base/mixed_${tag}_$nb"
        val adds = spark.range(n / 20 - 1)
          .where(pmod(xxhash64(col("id")), lit(50)) === 0)
          .select(lit("add").as("op"), (col("id") * 20 + 19).as("a"),
            ((col("id") + 1) * 20).as("b"))
        val rms = spark.range(n)
          .where(pmod(xxhash64(col("id") + 7), lit(2000)) === 0)
          .select(lit("rm").as("op"), col("id").as("a"), lit(-1L).as("b"))
        val ops = adds.unionAll(rms)
          .withColumn("__b", pmod(xxhash64(col("a"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$dir/in")
        val seq = timedFolds {
          graft.streaming.StateBackend.withRocksDb(spark) {
            force(graft.streaming.StreamingCcMixed.maintain(
              spark.readStream.schema("op STRING, a BIGINT, b BIGINT")
                .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
              labels, hist, ids, s"$dir/_ckpt",
              compactBound = compactBound))
          }
        }
        reportFolds(s"mixed_maint($nb,cb=$compactBound)", tag, seq)
      } finally hist.unpersist()
    }
    /** GROWING-standing-corpus maintenance (r17 verdict #7): the tag
      * scales ONLY the standing artifact; every fold carries the same
      * FIXED op count, and compactBound stays at its default so the
      * corpus-sized rewrite is amortized, not forced. Per-fold means
      * that hold flat across tags are the "cost ∝ batch, not corpus"
      * measurement; the compaction (when one lands) shows up as a
      * single fold above the mean — amortization visible directly. */
    def indexMaintGrow(tag: String, nb: Int = 16, batch: Long = 1000L)
        : Unit = {
      val n = 100000L * scaleOf(tag)
      val histM = spark.range(n).select(
        concat(lit("k"), (col("id") / 5)).as("k"), col("id").as("doc_id"))
        .persist()
      try {
        val index = histM.groupBy(col("k"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_occ"))
        val dir = s"$base/idxg_${tag}_$nb"
        val total = nb * batch
        val adds = spark.range(total * 9 / 10)
          .select(lit("add").as("op"), (col("id") + n).as("doc_id"),
            concat(lit("k"), pmod(xxhash64(col("id")), lit(n / 5)))
              .as("text"))
        val rms = spark.range(total / 10)
          .select(lit("rm").as("op"),
            pmod(xxhash64(col("id") + 3), lit(n)).as("doc_id"),
            lit(null).cast("string").as("text"))
        val ops = adds.unionAll(rms).withColumn("__b",
          pmod(xxhash64(col("doc_id"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$dir/in")
        val seq = timedFolds {
          graft.streaming.StateBackend.withRocksDb(spark) {
            force(graft.streaming.StreamingIndexMaint.maintain(
              spark.readStream
                .schema("op STRING, doc_id BIGINT, text STRING")
                .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
              index, histM, s"$dir/_ckpt", keyCol = "k",
              docCol = "doc_id", orderCols = Seq("doc_id"),
              mkMembers = b => b.select(col("text").as("k"),
                col("doc_id"))))
          }
        }
        reportFolds(s"index_grow($nb,b=$batch)", tag, seq)
      } finally histM.unpersist()
    }

    def mixedMaintGrow(tag: String, nb: Int = 16, batch: Long = 1000L)
        : Unit = {
      val n = 100000L * scaleOf(tag)
      val total = nb * batch
      // ids must cover history ∪ adds — new nodes live above n
      val ids = spark.range(n + total).select(col("id").as("doc_id"))
      val hist = spark.range(n - 1).where((col("id") + 1) % 20 =!= 0)
        .select(col("id").as("a"), (col("id") + 1).as("b")).persist()
      try {
        // the planted history is a chain broken every 20 nodes, so its
        // CC labels are ANALYTIC (blocks of 20, canonical = block min)
        // — constructing them directly instead of solving keeps the
        // 100× column setup-feasible (a 10M-node chain is star
        // contraction's worst case, and the solve is fixture setup,
        // not the thing this probe measures)
        val labels = spark.range(n).select(col("id").as("doc_id"),
            (col("id") - pmod(col("id"), lit(20))).as("cluster_id"))
          .localCheckpoint()
        val dir = s"$base/mixg_${tag}_$nb"
        // each add joins one NEW node to an existing one (merge work
        // bounded by the batch); removes hit existing nodes
        val adds = spark.range(total * 9 / 10)
          .select(lit("add").as("op"), (col("id") + n).as("a"),
            pmod(xxhash64(col("id")), lit(n)).as("b"))
        val rms = spark.range(total / 10)
          .select(lit("rm").as("op"),
            pmod(xxhash64(col("id") + 7), lit(n)).as("a"),
            lit(-1L).as("b"))
        val ops = adds.unionAll(rms)
          .withColumn("__b", pmod(xxhash64(col("a"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$dir/in")
        val seq = timedFolds {
          graft.streaming.StateBackend.withRocksDb(spark) {
            force(graft.streaming.StreamingCcMixed.maintain(
              spark.readStream.schema("op STRING, a BIGINT, b BIGINT")
                .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
              labels, hist, ids, s"$dir/_ckpt"))
          }
        }
        reportFolds(s"mixed_grow($nb,b=$batch)", tag, seq)
      } finally hist.unpersist()
    }

    def ivfMaintGrow(tag: String, nb: Int = 16, batch: Long = 1000L)
        : Unit = {
      val n = 100000L * scaleOf(tag)
      val dim = 8
      def vecOf(c: org.apache.spark.sql.Column) = array(
        (0 until dim).map(j =>
          pmod(xxhash64(c, lit(j)), lit(997)).cast("double") / 997.0): _*)
      val cents: Array[(Int, Array[Double])] = Array.tabulate(4)(i =>
        i -> Array.tabulate(dim)(j => ((i * 7 + j * 3) % 10) / 10.0))
      def mk(df: org.apache.spark.sql.DataFrame) =
        graft.similarity.Similarity.assignCells(df, cents)
          .select(col("vec_id"), col("cell"), col("e"))
      val standing = mk(spark.range(n).select(col("id").as("vec_id"),
        vecOf(col("id")).as("e"))).persist()
      try {
        standing.count()
        val dir = s"$base/ivfg_${tag}_$nb"
        val total = nb * batch
        val adds = spark.range(total * 9 / 10)
          .select(lit("add").as("op"), (col("id") + n).as("vec_id"),
            vecOf(col("id") + n).as("e"))
        val rms = spark.range(total / 10)
          .select(lit("rm").as("op"),
            pmod(xxhash64(col("id") + 11), lit(n)).as("vec_id"),
            lit(null).cast("array<double>").as("e"))
        val ops = adds.unionAll(rms).withColumn("__b",
          pmod(xxhash64(col("vec_id"), col("op")), lit(nb)))
        for (b <- 0 until nb)
          ops.where(col("__b") === b).drop("__b").repartition(1)
            .write.mode("append").parquet(s"$dir/in")
        val seq = timedFolds {
          graft.streaming.StateBackend.withRocksDb(spark) {
            force(graft.streaming.StreamingIvfMixed.maintain(
              spark.readStream
                .schema("op STRING, vec_id BIGINT, e ARRAY<DOUBLE>")
                .option("maxFilesPerTrigger", "1").parquet(s"$dir/in"),
              standing, s"$dir/_ckpt", idCol = "vec_id",
              mkPostings = mk))
          }
        }
        reportFolds(s"ivf_grow($nb,b=$batch)", tag, seq)
      } finally standing.unpersist()
    }

    def ccStarChain(tag: String): Unit = {
      val n = 100000L * scaleOf(tag)
      val ids = spark.range(n).select(col("id").as("doc_id"))
      val edges = spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val (labels, rounds) =
        graft.analytics.Graphs.ccWithRounds(ids, edges, "doc_id", 60)
      force(labels)
      println(s"[elast]   cc_star_chain $tag rounds=$rounds " +
        s"(propagation would need $n rounds)")
    }
    // events-shaped stream for the time joins: n events over 30 days of
    // integer-ns timestamps, users ∝ corpus (constant per-user density)
    def genEvents(tag: String): DataFrame = {
      val users = 2000L * scaleOf(tag)
      spark.range(200000L * scaleOf(tag)).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id")), lit(users)).as("user_id"),
        pmod(xxhash64(col("id") * 3 + 1), lit(2592000000000000L)).as("ts"),
        (pmod(xxhash64(col("id") * 5 + 2), lit(1000)).cast("double") / 10)
          .as("value"),
        pmod(col("id"), lit(2)).as("side"))
    }
    // as-of join: one shuffle + per-key sorted window — expect ~linear
    def asofProbe(tag: String): Unit = {
      val ev = genEvents(tag).persist()
      try {
        val views = ev.where(col("side") === 0)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purch = ev.where(col("side") === 1)
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pv"))
        force(AsofJoin.asof(views, purch, Seq("user_id"), "ts", Seq("pv")))
      } finally ev.unpersist()
    }
    // range join: window-width buckets (2 bucket rows per interval),
    // (user, bucket) equi-join + exact verify — expect ~linear in
    // inputs + matches
    def rangeProbe(tag: String): Unit = {
      val sixH = 6L * 3600L * 1000000000L
      val ev = genEvents(tag).persist()
      try {
        val views = ev.where(col("side") === 0)
          .select(col("user_id"), col("ts"), col("value"))
        val windows = ev.where(col("side") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("lo"), (col("ts") + lit(sixH - 1)).as("hi"))
        force(RangeJoin.pointInInterval(views, windows, "ts", "lo", "hi",
            bucket = sixH, keyCols = Seq("user_id"))
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("s")))
      } finally ev.unpersist()
    }

    // hot-key as-of: 90% of events on ONE user — the plain window form
    // serializes that key into a single sort task; the bucketed form
    // spreads it over (key, time-bucket) partitions with a spine carry
    def genHotEvents(tag: String): DataFrame = {
      val users = 2000L * scaleOf(tag)
      spark.range(200000L * scaleOf(tag)).select(
        col("id").as("event_id"),
        when(pmod(xxhash64(col("id") * 11 + 4), lit(10)) < 9, lit(7L))
          .otherwise(pmod(xxhash64(col("id")), lit(users))).as("user_id"),
        pmod(xxhash64(col("id") * 3 + 1), lit(2592000000000000L)).as("ts"),
        (pmod(xxhash64(col("id") * 5 + 2), lit(1000)).cast("double") / 10)
          .as("value"),
        pmod(col("id"), lit(2)).as("side"))
    }
    def asofHot(tag: String, bucketed: Boolean): Unit = {
      val ev = genHotEvents(tag).persist()
      try {
        val views = ev.where(col("side") === 0)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purch = ev.where(col("side") === 1)
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pv"))
        val joined =
          if (bucketed) AsofJoin.asofBucketed(views, purch, Seq("user_id"),
            "ts", Seq("pv"), bucket = 6L * 3600L * 1000000000L)
          else AsofJoin.asof(views, purch, Seq("user_id"), "ts", Seq("pv"))
        force(joined)
      } finally ev.unpersist()
    }

    // round-14 additions ------------------------------------------------
    // exact-threshold PPJoin self-join (q184): df-ordered prefixes →
    // prefix-gram equi-join → candidate verify; the claim is the prefix
    // filter keeps candidates near-linear while the result stays exact
    def ppjoin(tag: String): Unit =
      force(Dedup.ppjoinExact(Dedup.shingles(docs(tag)), num = 1, den = 2))
    // exact containment join (q208): contained-side prefix only — same
    // df-ordered machinery as ppjoin, asymmetric candidate source
    def containment(tag: String): Unit =
      force(Dedup.containmentJoin(Dedup.shingles(docs(tag)),
        num = 4, den = 5))
    // fuzzy best-match linkage (q191): rare-bigram blocked levenshtein —
    // candidate fan-out bounded by the probed key's df
    def fuzzy(tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val d0 = docs(tag).select(col("doc_id"), split(col("text"), " ").as("w0"))
        .where(size(col("w0")) >= 8)
        .select(col("doc_id"), slice(col("w0"), 1, 8).as("tw"))
      val clean = d0.select(col("doc_id").as("ck"),
        array_join(col("tw"), " ").as("cn"), col("tw"))
      val cb = clean.select(col("ck"), explode(expr(
        "transform(sequence(1, 7), i -> concat(element_at(tw, i), ' ', element_at(tw, i + 1)))"))
        .as("bg"))
      val dfq = cb.groupBy("bg").agg(count(lit(1)).as("df"))
      val dirty = d0.select(col("doc_id").as("dk"),
          concat(slice(col("tw"), 1, 2), slice(col("tw"), 4, 5)).as("dw"))
        .select(col("dk"), array_join(col("dw"), " ").as("dn"), col("dw"))
      val dbg = dirty.select(col("dk"), col("dn"), explode(expr(
        "transform(sequence(1, 6), i -> concat(element_at(dw, i), ' ', element_at(dw, i + 1)))"))
        .as("bg"))
      val wr = Window.partitionBy(col("dk")).orderBy(col("df"), col("bg"))
      val rare = dbg.join(dfq, "bg")
        .withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
        .select(col("dk"), col("dn"), col("bg"))
      val cands = rare.join(cb.distinct(), "bg")
        .select(col("dk"), col("dn"), col("ck")).distinct()
      val wb = Window.partitionBy(col("dk")).orderBy(col("dist"), col("ck"))
      force(cands.join(clean.select(col("ck"), col("cn")), "ck")
        .withColumn("dist", levenshtein(col("dn"), col("cn")))
        .withColumn("rn", row_number().over(wb)).where(col("rn") === 1))
    }
    // dense-grid gap fill (q193): grid size is SPAN-bounded (constant
    // 30-day window), so 10× more events should cost ~the per-minute
    // aggregate alone — the sublinear claim
    def gapfill(tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val e = genEvents(tag).where(col("side") === 0)
        .select(expr("ts div 60000000000").as("minute"), col("value"))
      val perMin = e.groupBy(col("minute"))
        .agg(count(lit(1)).as("n_obs"), avg(col("value")).as("mv"))
      val span = perMin.agg(min(col("minute")).as("mn"),
        max(col("minute")).as("mx"))
      val grid = span.select(
        explode(sequence(col("mn"), col("mx"))).as("minute"))
      val g = grid.join(perMin, Seq("minute"), "left_outer")
        .withColumn("day", expr("minute div 1440"))
      val wIn = Window.partitionBy(col("day")).orderBy(col("minute"))
      val marked = g.withColumn("grpd", count(col("mv")).over(wIn))
      val inDay = marked.withColumn("in_fill", when(col("grpd") > 0,
        max(col("mv")).over(Window.partitionBy(col("day"), col("grpd")))))
      val spine = marked.where(col("mv").isNotNull)
        .groupBy(col("day")).agg(max_by(col("mv"), col("minute")).as("lv"))
      val wSpine = Window.orderBy(col("day"))
      val prior = g.select(col("day")).distinct()
        .join(spine, Seq("day"), "left_outer")
        .withColumn("g2", count(col("lv")).over(wSpine))
        .withColumn("cv", max(col("lv")).over(Window.partitionBy(col("g2"))))
        .withColumn("prior_close", lag(col("cv"), 1).over(wSpine))
        .select(col("day"), col("prior_close"))
      force(inDay.join(prior, "day")
        .select(col("minute"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          round(coalesce(col("in_fill"), col("prior_close")), 6)
            .as("v_filled")))
    }

    // EWMA segmented scan (q196): one shuffle + two window passes + a
    // spine fold per key — expect ~linear in events (200k × scale here,
    // 100 events/key average)
    def ewmaProbe(tag: String): Unit = {
      val ev = genEvents(tag)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      force(Recurrence.ewma(ev, Seq("user_id"),
        Seq(col("ts").asc, col("event_id").asc), "value", alpha = 0.2))
    }
    // Jaro–Winkler linkage (q195): the fuzzy-linkage blocking with the
    // native codegen'd scorer — candidate count identical to
    // fuzzy_linkage, so the delta between the two rows is pure
    // scorer cost (JW kernel vs levenshtein)
    def jwLinkage(tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val d0 = docs(tag).select(col("doc_id"), split(col("text"), " ").as("w0"))
        .where(size(col("w0")) >= 8)
        .select(col("doc_id"), slice(col("w0"), 1, 8).as("tw"))
      val clean = d0.select(col("doc_id").as("ck"),
        array_join(col("tw"), " ").as("cn"), col("tw"))
      val cb = clean.select(col("ck"), explode(expr(
        "transform(sequence(1, 7), i -> concat(element_at(tw, i), ' ', element_at(tw, i + 1)))"))
        .as("bg"))
      val dfq = cb.groupBy("bg").agg(count(lit(1)).as("df"))
      val dirty = d0.select(col("doc_id").as("dk"),
          concat(slice(col("tw"), 1, 2), slice(col("tw"), 4, 5)).as("dw"))
        .select(col("dk"), array_join(col("dw"), " ").as("dn"), col("dw"))
      val dbg = dirty.select(col("dk"), col("dn"), explode(expr(
        "transform(sequence(1, 6), i -> concat(element_at(dw, i), ' ', element_at(dw, i + 1)))"))
        .as("bg"))
      val wr = Window.partitionBy(col("dk")).orderBy(col("df"), col("bg"))
      val rare = dbg.join(dfq, "bg")
        .withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
        .select(col("dk"), col("dn"), col("bg"))
      val cands = rare.join(cb.distinct(), "bg")
        .select(col("dk"), col("dn"), col("ck")).distinct()
      val wb = Window.partitionBy(col("dk")).orderBy(col("jw").desc, col("ck"))
      force(cands.join(clean.select(col("ck"), col("cn")), "ck")
        .withColumn("jw", graft.functions.JaroWinkler(col("dn"), col("cn")))
        .withColumn("rn", row_number().over(wb)).where(col("rn") === 1))
    }

    // hot-key EWMA: 90% of all events on one user — the plain form's
    // per-key window is one straggler sorted run; the (key, time-bucket)
    // form spreads it over ~120 6-hour buckets (the asofBucketed trick
    // applied to the recurrence)
    def ewmaHot(tag: String, bucketed: Boolean): Unit = {
      val ev = genHotEvents(tag)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val out =
        if (bucketed) Recurrence.ewmaBucketed(ev, Seq("user_id"), "ts",
          Seq(col("ts").asc, col("event_id").asc), "value", 0.2,
          bucket = 6L * 3600L * 1000000000L)
        else Recurrence.ewma(ev, Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), "value", 0.2)
      force(out)
    }

    // round-15 additions ------------------------------------------------
    // the event-warehouse sweep (q186-q189, q192 shapes): each is one or
    // two keyed window passes / aggregates over the events shape with
    // O(1) per-key crossing state — the ~linear claim, measured
    val etype = pmod(xxhash64(col("event_id") * 17 + 6), lit(5))
    // q186: first-seen-week cohort assignment + (cohort, offset) distinct
    def cohortProbe(tag: String): Unit = {
      val e = genEvents(tag).select(col("user_id"),
        expr("ts div 604800000000000").as("wk"))
      val c = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      force(e.join(c, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("off"))
        .agg(countDistinct(col("user_id")).as("n_users")))
    }
    // q187: change-run SCD2 intervals — lag filter, then lead/row_number
    // over the (much smaller) run-opener frame
    def scd2Probe(tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runs = genEvents(tag)
        .select(col("user_id"), col("event_id"), col("ts"), etype.as("et"))
        .withColumn("p", lag(col("et"), 1).over(w))
        .where(col("p").isNull || col("p") =!= col("et"))
      force(runs.withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("version", row_number().over(w)))
    }
    // q188: successor pairs via one keyed lead + type×type aggregate
    def transitionsProbe(tag: String): Unit = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = genEvents(tag)
        .select(col("user_id"), col("event_id"), col("ts"), etype.as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .where(col("nxt").isNotNull)
      val counts = pairs.groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      force(counts.withColumn("p", col("n") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cur")))))
    }
    // q189: per-(series, day) OHLC — one keyed aggregate, 6 scalars/group
    def ohlcProbe(tag: String): Unit = {
      val e = genEvents(tag).select(etype.as("et"),
        expr("ts div 86400000000000").as("day"), col("ts"), col("value"))
      force(e.groupBy(col("et"), col("day"))
        .agg(min_by(col("value"), col("ts")).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), col("ts")).as("close"),
          count(lit(1)).as("n"), avg(col("value")).as("mean_v")))
    }
    // q192: history+delta partial aggregates merged by re-aggregation —
    // the mergeable-state contract, two partial passes + a tiny merge
    def aggMergeProbe(tag: String): Unit = {
      val e = genEvents(tag)
      def partials(df: DataFrame) = df.groupBy(etype.as("et"))
        .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
          min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      val hist = partials(e.where(pmod(col("event_id"), lit(10)) =!= 7))
      val delta = partials(e.where(pmod(col("event_id"), lit(10)) === 7))
      force(hist.unionByName(delta).groupBy(col("et"))
        .agg(sum(col("cnt")).as("n"), sum(col("sv")).as("sum_v"),
          min(col("mn")).as("first_ts"), max(col("mx")).as("last_ts")))
    }
    // q183: the EXACT ANALYZE pass — count + exact NDV + exact octiles
    // per melted column; per-group state is the column's value multiset
    // (the documented exact-vs-sketch reference point — q43/q70's
    // mergeable sketches are the 100 TB path, this is the bounded-table
    // calibration twin they are judged against)
    def analyzeStatsProbe(tag: String): Unit = {
      val e = genEvents(tag).select(expr(
        "stack(2, 'value', value, 'tsd', CAST(ts AS DOUBLE)) AS (col_name, v)"))
      force(e.groupBy(col("col_name")).agg(count(lit(1)).as("n"),
        countDistinct(col("v")).as("ndv"),
        percentile(col("v"), array((1 to 7).map(i =>
          lit(i / 8.0)): _*)).as("ps")))
    }
    // q183/q190's exact percentile engine at CORPUS NDV (r19, the r18
    // verdict's evidence gap): Percentiles.profile's histogram is
    // value-grain, and here the values are hash-derived doubles — NDV
    // ≈ rows, so each scale step grows the histogram with the corpus.
    // The row pins that the range-partitioned two-phase prefix sums
    // absorb it: per-task window state is the task's RANGE SLICE of one
    // group's histogram (guide §5 — spills bounded by the slice), where
    // a plain Window.partitionBy(group) would sort a whole column's NDV
    // on one task. (The q70 mergeable sketch stays the documented
    // corpus-NDV default; this is the exact path's measured ceiling.)
    def profileNdvProbe(tag: String): Unit = {
      val n = 200000L * scaleOf(tag)
      val e = spark.range(n).select(
        concat(lit("c"), pmod(col("id"), lit(3))).as("col_name"),
        (pmod(xxhash64(col("id") * 7 + 3), lit(1000000000000L))
          .cast("double") / 1e6).as("v"))
      force(graft.analytics.Percentiles.profile(e, "col_name", "v",
        (1 to 7).map(_ / 8.0)))
    }
    // q190 split in three: the same selective self-join WITHOUT stats
    // (plan-time sizing prices the filter at the full scan → SMJ), the
    // one-time ANALYZE pass, and the join again with the rule hinting
    // the measured ~1% side broadcast (SMJ→BHJ). Auto-broadcast is OFF
    // inside these probes so the flip is attributable to the rule, not
    // to the file being conveniently small at harness scale. ORDER
    // MATTERS: the analyze probe registers the stats the rule probe
    // needs (the prefix-filter arg can break this — rerun unfiltered).
    def withConf(k: String, v: String)(work: => Unit): Unit = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try work
      finally old match {
        case Some(o) => spark.conf.set(k, o)
        case None => spark.conf.unset(k)
      }
    }
    def hotJoin(tag: String): Unit =
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val ev = spark.read.parquet(s"$base/ev_$tag")
        val hot = ev.where(col("value") >= 99.0)
          .select(col("user_id").as("hk"), col("value").as("hv"))
        force(ev.join(hot, col("user_id") === col("hk"))
          .groupBy(etype.as("et"))
          .agg(count(lit(1)).as("n"), avg(col("hv")).as("avg_hot")))
      }
    def analyzePassProbe(tag: String): Unit = {
      val path = s"$base/ev_$tag"
      graft.plans.TableStats.analyze(spark.read.parquet(path), path,
        Seq("user_id", "value"))
    }
    // q185 split in two: the one-time bucketed LAYOUT write (ingest
    // cost: repartition-by-key + bucket-sorted parquet for both sides)
    // vs the recurring zero-Exchange bucketed JOIN it buys. event_id is
    // the join key (unique per row — the orders⋈lineitem key shape)
    def bucketLayoutProbe(tag: String): Unit = {
      val ev = spark.read.parquet(s"$base/ev_$tag")
      graft.analytics.Bucketing.writeBucketed(
        ev.select(col("event_id"), col("user_id")),
        s"els_a_$tag", s"$base/bkt_a_$tag", "event_id", 8)
      graft.analytics.Bucketing.writeBucketed(
        ev.select(col("event_id").as("eid"), col("value")),
        s"els_b_$tag", s"$base/bkt_b_$tag", "eid", 8)
    }
    def bucketJoinProbe(tag: String): Unit =
      force(graft.analytics.Bucketing
        .bucketedJoin(spark, s"els_a_$tag", s"els_b_$tag", "event_id", "eid")
        .groupBy(pmod(col("user_id"), lit(100)).as("g"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s")))

    // q203/q205: frozen-index delta assignment — centroids are a
    // DEPLOYED artifact (trained once on a CONSTANT-size history slice;
    // training cost is not what scales), the probe times assignment of
    // the full tag corpus + the per-cell drift aggregate. Assignment is
    // a pure map against the k×d literal; the aggregate exchanges k
    // rows — expect ~linear in corpus size at fixed k.
    def ivfDeltaProbe(tag: String): Unit = {
      val e = emb(tag)
      val cents = graft.similarity.Clustering.lloydCentroids(
        e.where(col("vec_id") < 2000), vecCol = "e", k = 8, updates = 1)
      force(graft.similarity.Clustering.assign(e, cents, vecCol = "e")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("dist2")).as("s")))
    }
    // q204: video fingerprint EXTRACTION (encode + real Y4M decode +
    // luma-sum sign bits per doc — the per-doc codec work; linear).
    // The pair stage is excluded by design: the synthetic family shape
    // grows family SIZE with the corpus, so its pair count is
    // quadratic-by-construction (output-bound, not machinery-bound);
    // the banded-join machinery's scaling is the measured LSH rows.
    def videoFpProbe(tag: String): Unit = {
      import spark.implicits._
      force(graft.ext.Multimodal.y4mFingerprints(
        docs(tag).select(col("doc_id")).as[Long]
          .map(d => graft.ext.MediaFile(d, "video/y4m",
            graft.ext.Multimodal.syntheticY4mFamily(d)))).toDF())
    }

    val probes: Seq[(String, String => Unit)] = Seq(
      ("exact_dedup", exactDedup _),
      ("minhash_lsh", lsh _),
      ("minhash_bands_only", lshBandsOnly _),
      ("minhash_cands_only", lshCandsOnly _),
      ("passage_dedup", passage _),
      ("ivf_multiprobe", (t: String) => ann(t, 8 * scaleOf(t))),
      ("ivfpq_adc_refine", (t: String) => pqadc(t, 8 * scaleOf(t))),
      ("spectral_pca", pca _),
      ("nb_classifier", nb _),
      ("pagerank", pagerank _),
      ("kmeans_lloyd", kmeans _),
      ("delta_dedup", delta _),
      ("codec_decode", codecs _),
      ("cc_star_random", ccStar _),
      ("cc_prop_random", ccProp _),
      ("cc_star_chain", ccStarChain _),
      ("cc_delta_inc", ccDeltaProbe _),
      ("cc_retract_random", (t: String) => ccRetractProbe(t, "random")),
      ("cc_retract_clustered", (t: String) => ccRetractProbe(t, "clustered")),
      ("dedup_retract", dedupRetractProbe _),
      ("ivf_tombstone", (t: String) => ivfTombstoneProbe(t, 8 * scaleOf(t))),
      ("mixed_maint_flat", (t: String) => mixedMaintProbe(t)),
      // the r16 verdict's long-horizon ask: >= 100 folds on a fixed
      // corpus with a FORCING compactBound, so per-fold flatness is
      // proven past every EdgeFrameCap coalesce and several
      // compaction boundaries (the planning bug surfaced at fold ~20)
      ("mixed_maint_long",
        (t: String) => mixedMaintProbe(t, nb = 100, compactBound = 10)),
      ("index_maint_long",
        (t: String) => indexMaintProbe(t, nb = 100, compactBound = 25)),
      // r17 verdict #7: the standing corpus GROWS with the tag while
      // every fold carries a fixed op count — per-fold means flat
      // across tags = cost ∝ batch, not corpus
      ("index_maint_grow", (t: String) => indexMaintGrow(t)),
      ("mixed_maint_grow", (t: String) => mixedMaintGrow(t)),
      ("ivf_maint_grow", (t: String) => ivfMaintGrow(t)),
      ("asof_join", asofProbe _),
      ("range_join", rangeProbe _),
      ("asof_hot_plain", (t: String) => asofHot(t, bucketed = false)),
      ("asof_hot_bucketed", (t: String) => asofHot(t, bucketed = true)),
      ("ppjoin_exact", ppjoin _),
      ("containment_exact", containment _),
      ("fuzzy_linkage", fuzzy _),
      ("gapfill_dense", gapfill _),
      ("jw_linkage", jwLinkage _),
      ("ewma_scan", ewmaProbe _),
      ("ewma_hot_plain", (t: String) => ewmaHot(t, bucketed = false)),
      ("ewma_hot_bucketed", (t: String) => ewmaHot(t, bucketed = true)),
      ("warehouse_cohort", cohortProbe _),
      ("warehouse_scd2", scd2Probe _),
      ("warehouse_transitions", transitionsProbe _),
      ("warehouse_ohlc", ohlcProbe _),
      ("warehouse_aggmerge", aggMergeProbe _),
      ("analyze_exact_stats", analyzeStatsProbe _),
      ("profile_exact_ndv", profileNdvProbe _),
      ("stats_join_nostats", hotJoin _),
      ("stats_analyze_pass", analyzePassProbe _),
      ("stats_join_ruled", hotJoin _),
      ("bucket_layout_write", bucketLayoutProbe _),
      ("bucket_zeroex_join", bucketJoinProbe _),
      ("ivf_delta_assign", ivfDeltaProbe _),
      ("video_fingerprint", videoFpProbe _))
    // optional name-prefix filter (comma-separated alternatives): rerun
    // a subset without paying the rest
    val selected = args.headOption
      .map { p =>
        val ps = p.split(',').toSeq
        probes.filter(pr => ps.exists(pr._1.startsWith))
      }.getOrElse(probes)
    // the stats/bucket probes read a PERSISTED events table (the stats
    // rule keys on the scanned parquet path; the layout probe re-reads
    // it) — written once per tag, outside any timed probe, and ONLY when
    // a selected probe needs it (a filtered rerun of unrelated probes
    // must not pay a full events-corpus write per tag)
    if (selected.exists { case (n, _) =>
        n.startsWith("stats") || n.startsWith("bucket") })
      for (tag <- tags)
        genEvents(tag).write.mode("overwrite").parquet(s"$base/ev_$tag")
    selected.foreach { case (name, f) =>
      run(name, tags.map(t => time(name, t)(f(t))))
    }

    println(s"[elast] summary (name, ${tags.mkString(" s, ")} s, ratio):")
    results.foreach { case (n, ts) =>
      val cols = ts.map(t => f"$t%7.1f").mkString(" ")
      println(f"[elast]   $n%-20s $cols ${ts.last / ts.head}%5.2f×")
    }
    spark.stop()
  }
}
