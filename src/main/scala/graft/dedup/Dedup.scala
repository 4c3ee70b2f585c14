package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives as a library: every function takes
  * and returns a DataFrame with caller-named columns, so they run on ANY
  * corpus frame — the driver-verified queries in
  * [[graft.queries.DedupQueries]] are these functions applied to the
  * testdata `documents` table (and the DuckDB oracles there pin the exact
  * semantics).
  *
  * Scale contract: `shingles`/`minhashBands`/`simhash` are pure map stages
  * (document-local signatures); only fixed-size sketch keys reach a
  * shuffle, via the candidate equi-joins. `clusters` is the Pregel-shaped
  * iterative step. All hashing is engine-portable: integer minwise
  * signatures ([[graft.functions.MinHashSlots]]) for the MinHash family,
  * md5 where a digest is genuinely needed.
  */
object Dedup {

  /** Lowercased alnum tokens of `textCol`. */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** (id, grams): distinct word-`n`-gram shingles per document (default 3,
    * the near-dup configuration; decontamination uses longer grams).
    * Documents with fewer than `n` tokens get an empty shingle set. */
  def shingles(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= n,
          array_distinct(transform(
            sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(o => element_at(col("toks"), i + o)): _*))))
          .otherwise(array().cast("array<string>")).as("grams"))
  }

  /** (id, sig: array<long>): the K-slot integer minwise signature
    * ([[graft.functions.MinHashSlots]] — one polynomial double-hash per
    * shingle, K universal integer mixes; the Broder scheme), computed
    * document-locally in one fused native pass. Replaces the K×md5
    * formulation, which paid K full digests + a 32-char string per shingle
    * per document — the engine's heaviest measured path. Exposed
    * separately from [[minhashBands]] for sketch-calibration QA (estimated
    * Jaccard = matching-slot fraction, q82). */
  def minhashSignature(grams: DataFrame, idCol: String = "doc_id",
      k: Int = 12, assumeNonEmpty: Boolean = false): DataFrame = {
    // The emptiness guard keeps gram-less documents from all sharing the
    // empty signature (every empty doc would bucket with every other).
    // When `grams` is an UNMATERIALIZED expression (the streaming path —
    // no cache exists to make it an attribute), this predicate is a trap:
    // filter pushdown substitutes the alias, so the ENTIRE shingling
    // expression re-evaluates per row at the SCAN — below any
    // repartition, i.e. serially in a single-split source's one task
    // (measured: ~15 s of q113's 16 s at sf0.1 in the md5 era). Callers
    // that already dropped gram-less docs on a cheap predicate (token
    // count) pass `assumeNonEmpty = true` to skip the guard entirely.
    val base =
      if (assumeNonEmpty) grams else grams.where(size(col("grams")) > 0)
    base.select(col(idCol),
      graft.functions.MinHashSlots(k)(col("grams")).as("sig"))
  }

  /** (id, band, band_key): MinHash-LSH band keys, computed document-locally
    * (no shuffle). Band key = the band's signature slice joined as a
    * comma-separated integer string — equality-only, so no digest is
    * needed on top of the slot values. */
  def minhashBands(grams: DataFrame, idCol: String = "doc_id",
      k: Int = 12, rowsPerBand: Int = 3,
      assumeNonEmpty: Boolean = false): DataFrame = {
    minhashSignature(grams, idCol, k, assumeNonEmpty)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(k / rowsPerBand - 1)), b =>
          array_join(transform(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")))
          .as(Seq("band", "band_key")))
  }

  /** Distinct candidate pairs (a < b) from band-key collisions — the LSH
    * equi-join that replaces the all-pairs comparison at scale. */
  def lshCandidates(bands: DataFrame, idCol: String = "doc_id"): DataFrame =
    bands.as("x")
      .join(bands.as("y"),
        col(s"x.band") === col(s"y.band") &&
          col(s"x.band_key") === col(s"y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()

  /** [[lshCandidates]] with a HOT-BUCKET BOUND — the skew mitigation for
    * boilerplate-heavy crawls, where one band bucket holding T near-
    * identical documents costs T·(T−1)/2 pairs on the ONE task that owns
    * that band key (measured super-linear in PLANS.md's skew table).
    * Buckets larger than `maxBucket` contribute NO pairs from this
    * band; a pair is only lost entirely when EVERY band it collides in
    * overflows — by construction that means the pair sits in a ≥
    * maxBucket-sized near-duplicate crowd, which the exact-dedup /
    * collapse level (the two-level shape, q158) already owns. The bound
    * is enforced by a bucket-keyed count + semi-join — linear, no pair
    * ever materializes for a skipped bucket — and the skipped mass is
    * ACCOUNTED, not silent: use [[lshOverflowBuckets]] for the audit
    * frame (the no-silent-caps contract). */
  def lshCandidatesBounded(bands: DataFrame, maxBucket: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val ok = bands.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucket)
      .select(col("band"), col("band_key"))
    lshCandidates(bands.join(ok, Seq("band", "band_key")), idCol)
  }

  /** The audit companion to [[lshCandidatesBounded]]: one row per band
    * bucket SKIPPED by the bound — (band, band_key, n_members). Emit its
    * aggregate next to any bounded run so the cap is visible in the
    * pipeline's own output, never a silent recall cliff. */
  def lshOverflowBuckets(bands: DataFrame, maxBucket: Int): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    bands.groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucket)
  }

  /** Exact Jaccard over given candidate pairs only (candidate-driven
    * verify): returns (id_a, id_b, jaccard).
    *
    * Shape: fetch both documents' gram ARRAYS onto the pair row (two
    * id-keyed equi-joins, one row per pair) and intersect them natively —
    * |A∩B| is a per-row hash-set probe over ~hundreds of elements. The
    * earlier explode-join form (pairs × grams rows shuffled through a
    * count aggregate, then two more joins for the set sizes) was 81% of
    * the measured 10× LSH wall time; verify work here is
    * O(pairs · gramsPerDoc) with NO corpus-sized explode and no
    * re-aggregation — the shuffles carry pairs and grams rows only. */
  def jaccardVerify(cands: DataFrame, grams: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    cands
      .join(grams.select(col(idCol).as("id_a"), col("grams").as("__ga")),
        "id_a")
      .join(grams.select(col(idCol).as("id_b"), col("grams").as("__gb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ga"), col("__gb"))).as("common"),
        size(col("__ga")).as("na"), size(col("__gb")).as("nb"))
      // common > 0 preserves the original explode-join semantics: a
      // band-key collision between gram-DISJOINT docs must not surface a
      // jaccard=0 row (the SQL oracles inner-join on shared grams, so such
      // a row exists only on the engine side — a latent hash-mismatch).
      .where(col("common") > 0)
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))

  /** (id, fingerprint): SimHash over an array-of-features column — bit j
    * is the sign of the ±1 vote sum over md5(feature) hex digit j. Use the
    * shingle set as features for order-sensitive near-dup detection (the
    * production configuration, q58); token sets measure vocabulary overlap
    * only. `bits` is capped at 32: each bit votes on one md5 hex digit,
    * and a wider request would silently read past the 32-char digest —
    * every trailing bit constant '0', fingerprints colliding en masse. */
  def simhash(featureDf: DataFrame, featuresCol: String,
      idCol: String = "doc_id", bits: Int = 32,
      out: String = "fingerprint"): DataFrame = {
    require(bits >= 1 && bits <= 32,
      s"bits must be in [1, 32] (one md5 hex digit per bit), got $bits")
    val bitPasses = transform(sequence(lit(1), lit(bits)), j =>
      when(aggregate(col("__hs"), lit(0), (acc, h) =>
        acc + when(h.substr(j, lit(1))
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
          .otherwise(-1)) > 0, lit("1")).otherwise(lit("0")))
    featureDf
      .where(size(col(featuresCol)) > 0)
      .select(col(idCol), transform(col(featuresCol), f => md5(f)).as("__hs"))
      .repartition(col(idCol)) // barrier: hash once, not once per bit pass
      .select(col(idCol), array_join(bitPasses, "").as(out))
  }

  /** Near-dup pairs within `maxHamming` of equal-width fingerprints,
    * banded into `nBlocks` equal substrings (pigeonhole: complete for
    * hamming < nBlocks). Uses the native codegen'd Hamming expression. */
  def simhashPairs(sim: DataFrame, idCol: String = "doc_id",
      fpCol: String = "fingerprint", nBlocks: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    val spark = sim.sparkSession
    val width = length(col(fpCol))
    // integer block boundaries covering the WHOLE string: block b spans
    // positions floor(w*b/n)+1 .. floor(w*(b+1)/n). A plain width/nBlocks
    // division is fractional when n does not divide w, leaving trailing
    // characters outside every block and voiding the pigeonhole guarantee.
    def bound(b: Column): Column = floor(width * b / nBlocks).cast("int")
    val banded = sim.select(col(idCol), col(fpCol),
      posexplode(transform(sequence(lit(0), lit(nBlocks - 1)), b =>
        col(fpCol).substr(bound(b) + 1, bound(b + 1) - bound(b))))
        .as(Seq("blk", "block")))
    // hamming (native codegen, cheap) computed and filtered BEFORE the
    // distinct: the dedup shuffle then carries (id, id, int) instead of
    // two fingerprint strings per row, and over-threshold candidates
    // never reach the exchange
    val ham = graft.functions.HammingDistance(
      col(s"x.$fpCol"), col(s"y.$fpCol"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.blk") === col("y.blk") && col("x.block") === col("y.block") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        ham.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over an undirected pair graph: every id in
    * `ids` labeled with its component's minimum id. Distributed min-label
    * propagation (one join + aggregation per round, rounds = component
    * diameter); the driver loop moves only a convergence count.
    *
    * Components with diameter > `maxRounds` would be silently mislabeled,
    * so non-convergence after `maxRounds` throws rather than returning
    * wrong labels — raise `maxRounds` (cost is one join per round) if a
    * real graph trips it. */
  def clusters(ids: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", maxRounds: Int = 20): DataFrame = {
    val edges = pairs.toDF("a", "b")
    val und = edges.unionAll(edges.select(col("b"), col("a"))).toDF("src", "dst")
      .cache()
    var labels = graft.analytics.Graphs.flatCheckpoint(
      ids.select(col(idCol), col(idCol).as("cluster_id")))
    // (a size-derived per-round coalesce was tried in r18 and measured
    // a wash: the rounds' task-time is not where q161's wall goes —
    // driver gaps between the ~1-job rounds are — and the sizing counts
    // cost two extra jobs; reverted)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = und.join(labels, col("dst") === col(idCol))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      // lazy checkpoint + the convergence count as its materializing
      // action: ONE job per round (the ccWithRounds lesson); the
      // superseded round's checkpoint blocks are freed explicitly —
      // Dataset.unpersist is a no-op for them (see freeLocalCheckpoint)
      // flatCheckpoint, not plain localCheckpoint: per-round checkpoints
      // must not carry origin statistics forward — the join-product
      // sizeInBytes compounds across rounds (see Graphs.flatCheckpoint)
      val next = graft.analytics.Graphs.flatCheckpoint(
        labels.join(nbrMin, col(idCol) === col("src"), "left")
          .select(col(idCol),
            least(col("cluster_id"),
              coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id")), eager = false)
      changed = next.as("n")
        .join(labels.select(col(idCol), col("cluster_id").as("old")), idCol)
        .where(col("cluster_id") =!= col("old")).count()
      graft.analytics.Graphs.freeLocalCheckpoint(labels)
      labels = next
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"Dedup.clusters: min-label propagation did not converge after " +
          s"$maxRounds rounds ($changed labels still changing) — a " +
          s"component's diameter exceeds maxRounds; raise it")
    // labels is localCheckpoint()ed (lineage truncated), so the edge cache
    // can be released here instead of pinning storage for the session
    und.unpersist(blocking = false)
    labels
  }

  /** (id, pos, hv): positional char-`k`-gram hashes of the normalized
    * (`[^a-z0-9]+` stripped, lowercased) text, exploded — the input of
    * exact-substring duplicate detection ([[dupSpans]]). One O(n) rolling
    * pass per document ([[graft.functions.GramHashes]]); `pos` is the
    * 0-based gram start offset in the normalized string. */
  def gramPositions(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 40): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9]+", "")
    docs
      .select(col(idCol),
        graft.functions.GramHashes(k)(norm).as("__hs"))
      .select(col(idCol), posexplode(col("__hs")).as(Seq("pos", "hv")))
  }

  /** CONTENT-DEFINED chunking (Rabin-style, the LBFS rule — public:
    * Muthitacharoen et al. 2001): a chunk boundary falls wherever the
    * rolling hash of the `window`-char gram starting at a position is
    * ≡ 0 mod `divisor` — so boundaries follow CONTENT, not offsets, and
    * an insertion early in a document shifts only the chunk it lands in
    * (fixed-size tiling — q100/q108's grain — re-cuts everything after
    * the edit, which defeats chunk-level dedup on revised documents).
    * Expected chunk length ≈ divisor chars over the normalized text.
    *
    * Reuses [[gramPositions]]' O(n) double-width rolling hash (a native
    * codegen expression), so the scan is one map stage; the per-document
    * boundary rollup is a keyed aggregate carrying only boundary
    * positions. Returns (id, n_norm, n_chunks, bounds_digest) — the
    * digest pins the exact boundary set for oracle comparison; callers
    * slicing real chunks explode on the same positions. */
  def cdcChunks(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 8,
      divisor: Long = 32): DataFrame = {
    require(window >= 1 && divisor >= 1,
      s"bad CDC parameters window=$window divisor=$divisor")
    val pos = gramPositions(docs, idCol, textCol, k = window)
    val bounds = pos
      .where(col("pos") >= 1 && pmod(col("hv"), lit(divisor)) === 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bounds"),
        md5(concat_ws(",", transform(sort_array(collect_list(col("pos"))),
          p => p.cast("string")))).as("bounds_digest"))
    docs
      .select(col(idCol),
        length(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", ""))
          .as("n_norm"))
      .join(bounds, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_norm"),
        (coalesce(col("n_bounds"), lit(0L)) + 1).as("n_chunks"),
        coalesce(col("bounds_digest"), md5(lit(""))).as("bounds_digest"))
  }

  /** Exact-substring duplicate spans per document, in the style of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"): a char position is *duplicated* when some `k`-gram covering
    * its run occurs at least `minCount` times corpus-wide (cross-document
    * boilerplate AND within-document self-repetition both count, as in the
    * suffix-array formulation). Per document: duplicated gram starts are
    * merged into maximal spans (interval union — consecutive starts ≤ k
    * apart overlap), reported as
    * `(id, n_dup_grams, n_spans, dup_chars, dup_frac)` for every input
    * document, zeros when nothing is duplicated.
    *
    * Scale: gram frequency is a hash-keyed shuffle with map-side partial
    * aggregation (vocabulary-sized state); the duplicated-hash join back
    * to positions is an equi-join on `hv`; the span merge is a per-document
    * window — everything is linear in corpus size, and unlike pair-based
    * detectors there is NO candidate pair set at all. The union length
    * needs no explicit span grouping: sorted by `pos`, each duplicated
    * gram contributes `min(pos − prev_pos, k)` new chars (`k` for a span
    * head).
    *
    * `positions` is [[gramPositions]] output (pass a cached frame — it
    * sits on both sides of the frequency join); `docs` supplies the
    * per-document normalized length for `dup_frac`. */
  def dupSpans(positions: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 40,
      minCount: Int = 2): DataFrame = {
    val dupH = positions.groupBy(col("hv"))
      .agg(count(lit(1)).as("__c")).where(col("__c") >= minCount)
      .select(col("hv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val gaps = positions.join(dupH, "hv")
      .select(col(idCol),
        (col("pos") - lag(col("pos"), 1).over(w)).as("__gap"))
    val perDoc = gaps.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_dup_grams"),
      sum(when(col("__gap").isNull || col("__gap") > k, 1L).otherwise(0L))
        .as("n_spans"),
      sum(when(col("__gap").isNull, k.toLong)
        .otherwise(least(col("__gap"), lit(k.toLong)))).as("dup_chars"))
    docs
      .select(col(idCol),
        length(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", ""))
          .as("__len"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        round(coalesce(col("dup_chars"), lit(0L)) /
          greatest(col("__len"), lit(1)), 6).as("dup_frac"))
  }

  /** The surgery half of [[dupSpans]] (Lee et al. CUT the duplicated
    * spans from the training text, they don't just measure them): every
    * maximal duplicated span — consecutive duplicated gram starts ≤ k
    * apart, covering [min pos, max pos + k) of the NORMALIZED text — is
    * removed, and the surviving segments are re-concatenated. Returns one
    * row per input document:
    * `(idCol, n_islands, clean_len, clean_digest)` where `clean_digest`
    * is the md5 of the cleaned normalized text (documents with no
    * duplicated spans pass through unchanged).
    *
    * Shape: the duplicated-position table (shared with [[dupSpans]] via a
    * cached `positions` frame) sessionizes into islands with one keyed
    * window (the q52 gaps-and-islands pattern), islands → kept segments
    * with a second keyed window (each island emits the gap BEFORE it;
    * one tail segment per document closes the text), and the segment
    * substrings concatenate in offset order document-locally. Everything
    * shards by document; nothing is corpus-global beyond the gram
    * frequency already paid for by detection. */
  def removeDupSpans(positions: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", k: Int = 40,
      minCount: Int = 2): DataFrame = {
    val dupH = positions.groupBy(col("hv"))
      .agg(count(lit(1)).as("__c")).where(col("__c") >= minCount)
      .select(col("hv"))
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    // islands: consecutive duplicated gram starts ≤ k apart merge (their
    // covered char ranges overlap); a break starts a new island.
    // localCheckpoint: the island table is TINY (one row per maximal
    // span) but three consumers sit on it (head gaps, tail gaps, island
    // counts) — uncheckpointed, each re-runs the position join + window
    // sort, tripling the whole detection cost (measured 4.1 s → 1.5 s at
    // sf0.1)
    val islands = positions.join(dupH, "hv")
      .select(col(idCol), col("pos"),
        when(col("pos") - lag(col("pos"), 1).over(wPos) > k, 1L)
          .otherwise(when(lag(col("pos"), 1).over(wPos).isNull, 1L)
            .otherwise(0L)).as("__brk"))
      .withColumn("__isl", sum(col("__brk")).over(wPos))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("__lo"), (max(col("pos")) + k).as("__hi"))
      .localCheckpoint()
    // norm behind an exchange: three joins consume it, and the identical
    // repartition subtrees collapse to ONE executed normalization stage
    // (AQE stage reuse) instead of three full-text regexp passes
    val norms = docs.select(col(idCol),
      regexp_replace(lower(col(textCol)), "[^a-z0-9]+", "").as("__norm"))
      .repartition(col(idCol))
    // kept segments: the gap before each island + one tail per document
    val wIsl = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__lo"))
    val headGaps = islands
      .select(col(idCol),
        coalesce(lag(col("__hi"), 1).over(wIsl), lit(0L)).as("__gs"),
        col("__lo").as("__ge"))
      .where(col("__ge") > col("__gs"))
    val tailGaps = islands.groupBy(col(idCol))
      .agg(max(col("__hi")).as("__gs"))
      .join(norms, idCol)
      .select(col(idCol), col("__gs"),
        length(col("__norm")).cast("long").as("__ge"))
      .where(col("__ge") > col("__gs"))
    val cleaned = headGaps.unionByName(tailGaps)
      .join(norms, idCol)
      .select(col(idCol), col("__gs"),
        substring(col("__norm"), (col("__gs") + 1).cast("int"),
          (col("__ge") - col("__gs")).cast("int")).as("__piece"))
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__gs"), col("__piece")))),
        s => s.getField("__piece")), "").as("__clean"))
    val nIslands = islands.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_islands"))
    norms
      .join(nIslands, Seq(idCol), "left")
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        // a doc may be ENTIRELY duplicated (no kept segments): cleaned
        // text is empty, not the untouched norm
        when(col("n_islands").isNull, col("__norm"))
          .otherwise(coalesce(col("__clean"), lit(""))).as("__out"))
      .select(col(idCol), col("n_islands"),
        length(col("__out")).as("clean_len"),
        md5(col("__out")).as("clean_digest"))
  }

  /** Two-phase benchmark decontamination: a Bloom filter built over the
    * benchmark gram set prunes the corpus gram stream (native codegen'd
    * probe, [[graft.functions.BloomMightContain]]), and ONLY the
    * survivors enter the exact gram equi-join verify. The Bloom probe has
    * no false negatives, and the verify removes its false positives, so
    * the result EQUALS the plain exact join (the oracle is the exact
    * join's SQL) — the filter is purely the scale lever.
    *
    * Why this beats broadcasting the gram set itself (the q71 shape) at
    * 100 TB: a broadcast hash join ships and builds the full benchmark
    * STRING set per executor, while the Bloom filter is ~10 bits/element
    * (50–100× smaller), probes in a few cache lines, and drops
    * ~(1 − fpp) of non-contaminated corpus rows before any join — the
    * verify join's input shrinks from |corpus grams| to
    * |true hits| + fpp·|corpus grams|. Building the filter is one
    * distributed aggregation over the (tiny) benchmark side.
    *
    * Returns one row per contaminated corpus document:
    * `(idCol, n_hits)` — its count of grams shared with the benchmark.
    *
    * The distinct benchmark-gram frame has THREE consumers (the sizing
    * count, the filter build, the verify-join broadcast), so it must be
    * materialized once; `cacheBench` decides its lifecycle. The default
    * `.cache()` pins it until the session ends — callers with a lifecycle
    * (the q77 wrapper) pass a Caches-backed barrier instead so
    * `Caches.evict(session)` can release it. */
  def bloomDecontaminate(corpusGrams: DataFrame, benchGrams: DataFrame,
      fpp: Double = 0.01, idCol: String = "doc_id",
      gramCol: String = "gram",
      cacheBench: DataFrame => DataFrame = _.cache()): DataFrame = {
    val bench = cacheBench(benchGrams.select(col(gramCol)).distinct())
    val nBench = bench.count() // driver scalar: sizes the filter
    val bf = bench.select(xxhash64(col(gramCol)).as("__h"))
      .stat.bloomFilter("__h", math.max(nBench, 1L), fpp)
    corpusGrams
      .where(graft.functions.BloomMightContain(bf)(
        xxhash64(col(gramCol))))
      .join(broadcast(bench), gramCol)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Canonical-member selection per duplicate cluster — the "keep the
    * best copy" step after [[clusters]]: given cluster members with
    * arbitrary attribute columns, pick ONE canonical member per cluster
    * by a caller-supplied total preference order (e.g. source priority,
    * then length, then id as the deterministic tiebreak).
    *
    * Returns `(clusterCol, n_members, canonical_<keepCols>...)` — one row
    * per cluster. Implemented as `min_by` over a packed ordering struct
    * (struct comparison is lexicographic by field position), NOT a
    * row_number window: the aggregate combines map-side, so the shuffle
    * carries one candidate row per (partition, cluster) instead of every
    * member, and no per-cluster sort ever runs — the shape that holds
    * when a boilerplate cluster has millions of members at 100 TB.
    *
    * `orderCols` must be non-null for every member (NULL sorts
    * unpredictably inside struct `min_by`); the caller owns that
    * contract, matching the columns it selects. */
  def canonicalPerCluster(members: DataFrame, clusterCol: String,
      orderCols: Seq[Column], keepCols: Seq[String]): DataFrame = {
    val pick = min_by(
      struct(keepCols.map(col): _*), struct(orderCols: _*))
    members.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"), pick.as("__pick"))
      .select(col(clusterCol) +: col("n_members") +:
        keepCols.map(c => col(s"__pick.$c").as(s"canonical_$c")): _*)
  }

  /** Exact UNIT-level dedup — the passage/paragraph/line-grain complement
    * of whole-document (q20) and char-gram span (q74) dedup: over an
    * exploded `(docCol, idxCol, unitCol)` frame, each distinct normalized
    * unit keeps exactly its globally FIRST occurrence (lexicographic min
    * of (doc, idx) — deterministic, run-order-independent) and every
    * later copy is marked dropped. The RefinedWeb-style boilerplate cut:
    * navigation chrome, license blocks, and template paragraphs repeat
    * across millions of pages and survive document-level dedup.
    *
    * Normalization: trim + lowercase + whitespace-collapse (the unit
    * equality a scrubber wants; callers needing byte equality pass
    * pre-normalized units). The shuffle key is the md5 of the normalized
    * unit — fixed 32 chars regardless of unit length, so the frequency
    * aggregation never carries passage text through the exchange (2⁻⁶⁴
    * collision odds are below any corpus size this engine will see; the
    * aggregation itself is map-side partial min/count, and the join back
    * is digest-keyed — nothing global, nothing driver-side).
    *
    * Appends `n_occ` (corpus-wide occurrences of this unit) and `keep`;
    * the caller filters `keep` and reassembles documents (idxCol order)
    * or rolls up per-document duplication stats.
    *
    * A NULL unit fails LOUDLY (`raise_error`) rather than silently
    * vanishing: md5(NULL) is NULL, and a NULL digest would never match
    * the inner equi-join, so the row would disappear from the output —
    * the same contract as `Sampling.hashSplit`'s NULL-id guard. Callers
    * with legitimately-nullable units filter them first, explicitly. */
  def dedupUnits(units: DataFrame, docCol: String = "doc_id",
      idxCol: String = "unit_idx", unitCol: String = "unit"): DataFrame = {
    val norm = regexp_replace(trim(lower(col(unitCol))), "\\s+", " ")
    val digest = when(col(unitCol).isNotNull, md5(norm)).otherwise(
      raise_error(concat(lit(s"dedupUnits: NULL $unitCol at "),
        col(docCol).cast("string"), lit("/"), col(idxCol).cast("string"))))
    val withK = units.withColumn("__k", digest)
    val firsts = withK.groupBy(col("__k"))
      .agg(min(struct(col(docCol), col(idxCol))).as("__first"),
        count(lit(1)).as("n_occ"))
    withK.join(firsts, "__k")
      .withColumn("keep",
        col(docCol) === col(s"__first.$docCol") &&
          col(idxCol) === col(s"__first.$idxCol"))
      .drop("__k", "__first")
  }

  /** WITHIN-document passage dedup — the intra-page boilerplate cut
    * (repeated nav blocks, footers, listing templates inside ONE page)
    * that complements [[dedupUnits]]' cross-corpus keep-first-global:
    * each document keeps the FIRST occurrence of every distinct
    * normalized `size`-token unit and drops later repeats, entirely
    * document-locally.
    *
    * Scale shape: a pure per-row map — tokenize, tile into units,
    * first-occurrence filter, re-concatenate, all inside one projection
    * with NO shuffle, NO state, NO join (IntraDocDedupSpec asserts the
    * optimized plan is Exchange-free). The per-document work is
    * O(units²) string compares in the worst case, bounded by the
    * document length the tiling divides — the right trade for web pages;
    * a corpus of pathological book-length documents routes through
    * [[dedupUnits]]' keyed shape instead.
    *
    * Units are token tiles, so the normalized unit IS its token join —
    * case/whitespace/punctuation differences between two copies of a
    * passage cannot defeat the equality. Returns (idCol, n_units,
    * n_kept, clean_digest): md5 of the cleaned token text, empty-string
    * digest for token-less documents. */
  def dedupUnitsLocal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 32): DataFrame = {
    require(size >= 1, s"unit size must be >= 1, got $size")
    val toks = tokens(col(textCol))
    val nUnits = ceil(org.apache.spark.sql.functions.size(col("__toks"))
      .cast("double") / size).cast("int")
    val units = transform(sequence(lit(0), col("__n") - 1),
      i => concat_ws(" ", slice(col("__toks"), i * size + 1, lit(size))))
    // keep unit i iff its first occurrence in the document is at i
    // (array_position is 1-based; the filter index is 0-based)
    val kept = filter(col("__units"),
      (u, i) => array_position(col("__units"), u) === i + 1)
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", nUnits)
      .withColumn("__units",
        when(col("__n") > 0, units).otherwise(array()))
      .withColumn("__kept", kept)
      .select(col(idCol),
        col("__n").as("n_units"),
        org.apache.spark.sql.functions.size(col("__kept")).as("n_kept"),
        md5(concat_ws(" ", col("__kept"))).as("clean_digest"))
  }

  /** INCREMENTAL exact dedup: scrub a freshly-ingested `delta` batch
    * against an already-curated `history` corpus without re-processing
    * history — the shape every recurring crawl runs (yesterday's 100 TB
    * stays untouched; only today's batch pays compute). A delta document
    * survives iff its normalized-text digest (a) does not appear in
    * history and (b) is the FIRST occurrence (min id) within the delta
    * itself.
    *
    * Scale contract: the history side collapses to DISTINCT digests
    * BEFORE the join — map-side partial distinct, so only the
    * digest-index (32 chars per distinct document, the thing a
    * production pipeline persists between runs) crosses the exchange,
    * never history text. The delta side is one keyed aggregate
    * (keep-first, q108's shape) plus two digest-keyed equi-joins;
    * nothing global, nothing driver-side. Callers with a persisted
    * index pass it as `history` with `historyIsDigests = true` and skip
    * the digest scan entirely; a Bloom filter over the index (q77's
    * decontamination shape) slots in front as a pre-filter when the
    * index outgrows a broadcast.
    *
    * Normalization matches [[dedupUnits]] (trim + lowercase +
    * whitespace-collapse), and NULL text fails LOUDLY the same way.
    * Returns the delta frame + `n_occ_delta` (occurrences within the
    * batch), `in_history`, and `keep`. */
  def dedupDelta(history: DataFrame, delta: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      historyIsDigests: Boolean = false): DataFrame = {
    val digest: Column = {
      val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
      when(col(textCol).isNotNull, md5(norm)).otherwise(
        raise_error(concat(lit(s"dedupDelta: NULL $textCol at "),
          col(idCol).cast("string"))))
    }
    val histIdx =
      (if (historyIsDigests) history.select(col("__k"))
       else history.select(digest.as("__k")))
        .distinct()
        .withColumn("__in_hist", lit(true))
    val withK = delta.withColumn("__k", digest)
    val firsts = withK.groupBy(col("__k"))
      .agg(min(col(idCol)).as("__first"),
        count(lit(1)).as("n_occ_delta"))
    withK.join(firsts, "__k")
      .join(histIdx, Seq("__k"), "left_outer")
      .withColumn("in_history", coalesce(col("__in_hist"), lit(false)))
      .withColumn("keep",
        !col("in_history") && col(idCol) === col("__first"))
      .drop("__k", "__first", "__in_hist")
  }

  /** DELETION for a standing keep-first digest index at ANY grain — the
    * takedown/GDPR path the add-only delta family couldn't answer (r14
    * verdict gap #1): remove a document set and have the index reflect
    * it WITHOUT recomputing the index over the corpus.
    *
    *  - `index`: the standing artifact — one row per digest:
    *    (keyCol, orderCols…, n_occ), keeper = min (orderCols…) member;
    *  - `members`: the (keyCol, docCol, orderCols…) rows it summarizes
    *    (doc grain: one row per doc, orderCols = Seq(docCol); passage
    *    grain: one row per unit, orderCols = Seq(doc, chunk));
    *  - `removals`: the docCol values to take down.
    *
    * Only digests the removal set TOUCHES are recomputed: their member
    * sets are gathered by a broadcast digest semi-join (a pruned member
    * scan — at scale, a digest-partitioned table makes this a point
    * lookup), keepers re-elected as the min retained (orderCols…) tuple
    * (a removed keeper hands off to the next occurrence), and digests
    * whose every member is removed VANISH. Untouched index rows pass
    * through unread. Cost ∝ |removals| + the touched digests' member
    * sets + one read-only scan each of index and members; row-equal to
    * rebuilding the index over `members ∖ removals` (DedupRetractSpec
    * pins handoff/vanish/untouched at both grains; q212 gates the
    * passage grain against exactly that full-recompute oracle). */
  def retractIndex(index: DataFrame, members: DataFrame,
      removals: DataFrame, keyCol: String, docCol: String,
      orderCols: Seq[String]): DataFrame = {
    val rem = broadcast(removals.select(col(docCol)).distinct())
    // digests the removal set touches (tiny: ≤ removed member rows)
    val affected = broadcast(
      members.join(rem, docCol).select(col(keyCol)).distinct())
    val reelected = members
      .join(affected, keyCol)
      .join(rem, Seq(docCol), "left_anti")
      .groupBy(col(keyCol))
      .agg(min(struct(orderCols.map(col): _*)).as("__kp"),
        count(lit(1)).as("n_occ"))
      .select(col(keyCol) +:
        orderCols.map(c => col("__kp").getField(c).as(c)) :+
        col("n_occ"): _*)
    index.join(affected, Seq(keyCol), "left_anti")
      .select(col(keyCol) +: orderCols.map(col) :+ col("n_occ"): _*)
      .unionAll(reelected)
  }

  /** [[retractIndex]] at the whole-document grain over q20's exact-dedup
    * index shape (text_hash, canonical_id, n_copies). */
  def dedupRetract(index: DataFrame, corpus: DataFrame,
      removals: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    retractIndex(
        index.select(col("text_hash"), col("canonical_id").as(idCol),
          col("n_copies").as("n_occ")),
        corpus.select(md5(col(textCol)).as("text_hash"), col(idCol)),
        removals, "text_hash", idCol, Seq(idCol))
      .select(col("text_hash"), col(idCol).as("canonical_id"),
        col("n_occ").as("n_copies"))

  /** DELETION for a standing near-dup EDGE cache — the takedown path
    * for the LSH pair table ([[minhashBands]] → [[lshCandidates]] →
    * [[jaccardVerify]]): drop every pair touching a removed doc, one
    * broadcast anti-join per endpoint. This is row-EQUAL to re-running
    * the whole LSH pipeline over the retained corpus — not an
    * approximation — because every stage is per-document or per-pair
    * local: shingles and minhash signatures are pure functions of one
    * document's text, a band collision is a property of the two
    * signatures alone, and the Jaccard verify reads only the pair's own
    * gram sets. No stage reads corpus-level state (unlike the DF-capped
    * q26 variant, whose gram sets shift with corpus frequencies —
    * retraction there is NOT rebuild-equal and must re-derive).
    * DedupRetractSpec pins the equivalence on the engine pipeline; q220
    * gates it against DuckDB's independent LSH rebuild over the
    * retained corpus. This is the epoch-handoff artifact for the
    * streaming maintainance loops (q215/q216): after a takedown cycle,
    * the next epoch's standing edge set derives from the cached pair
    * table in one pruning pass instead of re-running bands + verify
    * over the corpus. */
  def retractEdges(pairs: DataFrame, removals: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      idCol: String = "doc_id"): DataFrame = {
    val rem = broadcast(removals.select(col(idCol)).distinct())
    pairs
      .join(rem.select(col(idCol).as(aCol)), Seq(aCol), "left_anti")
      .join(rem.select(col(idCol).as(bCol)), Seq(bCol), "left_anti")
      .select(pairs.columns.toIndexedSeq.map(col): _*)
  }

  /** Vector-space near-dup: cosine similarity over DF-capped tf-idf
    * vectors — the bag-of-words complement of the shingle family
    * (catches reordered/paraphrase-ish duplicates whose word MULTISET
    * survives but whose n-gram sequence does not). The vocabulary is
    * pruned to words in ≤ `dfCap` documents before anything else: the
    * dropped high-DF words carry near-zero idf anyway, and the cap is
    * what bounds the pair join's per-word fan-out to dfCap² — the same
    * stop-shingle reasoning as the DF-capped Jaccard path. Weights are
    * tf·ln(N/df); norms are over the capped vocabulary (standard pruned
    * tf-idf). Scale shape: word-keyed equi-join with bounded fan-out,
    * one keyed aggregate per candidate pair — never all-pairs.
    * Returns (id_a, id_b, cos_sim) for every co-word pair; callers
    * threshold. */
  def tfidfPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dfCap: Int = 20): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("c"))
    val dfs = counts.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    // wt is exactly 0 when df == n (idf = ln 1): such words carry no
    // signal, and a document whose every capped word has df == n would
    // otherwise become a ZERO vector — a 0/0 cosine (ANSI divide error)
    // against any candidate. Dropping the rows drops those documents
    // from the candidate space entirely, which is the correct semantics
    // for an all-ubiquitous-words page.
    val w = counts.join(dfs, "word").crossJoin(broadcast(n))
      .select(col(idCol), col("word"),
        (col("c") * log(col("n") / col("df"))).as("wt"))
      .where(col("wt") =!= 0.0)
    val nrm = w.groupBy(col(idCol))
      .agg(sqrt(sum(col("wt") * col("wt"))).as("nrm"))
    w.alias("a")
      .join(w.alias("b"),
        col("a.word") === col("b.word") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(sum(col("a.wt") * col("b.wt")).as("dot"))
      .join(nrm.select(col(idCol).as("id_a"), col("nrm").as("na")), "id_a")
      .join(nrm.select(col(idCol).as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("dot") / (col("na") * col("nb"))).as("cos_sim"))
  }

  /** EXACT-threshold Jaccard similarity self-join via prefix filtering
    * (the PPJoin family: Chaudhuri et al. SSJoin / Xiao et al. PPJoin,
    * both public literature) — the exact complement to the MinHash-LSH
    * path: LSH is probabilistic (a qualifying pair can miss every band),
    * this returns EVERY pair with J ≥ t and nothing else, with no
    * all-pairs stage.
    *
    * The threshold is a RATIONAL num/den and every pruning decision is
    * integer arithmetic (`den·x ≥ num·y`), so a pair sitting exactly AT
    * the threshold can never be lost to float fuzz — and a DuckDB oracle
    * replays the same comparisons bit-for-bit.
    *
    * Filter chain (each a theorem, not a heuristic — zero false
    * negatives):
    *  1. global rarity order: grams sort by (corpus df, gram). A doc's
    *     PREFIX is its first |g| − ⌈t·|g|⌉ + 1 grams in that order — the
    *     rarest ones, so prefix-gram fan-out stays small.
    *  2. length filter: J(A,B) ≥ t ⇒ t·max(|A|,|B|) ≤ min(|A|,|B|).
    *  3. prefix filter: with the length filter in force,
    *     |A∩B| ≥ t/(1+t)·(|A|+|B|) ≥ ⌈t·|A|⌉, so two qualifying docs
    *     MUST share a gram inside both prefixes (pigeonhole).
    *  4. exact verify: candidate-driven `array_intersect` on the full
    *     gram arrays (the [[jaccardVerify]] shape), integer compare.
    *
    * Scale shape: the df aggregate is vocabulary-bounded; positions come
    * from a per-DOCUMENT window (doc-sized partitions, no global sort);
    * the candidate stage is an equi-join on prefix grams only — rare by
    * construction — and verify touches candidates, never the corpus
    * square. Takes the (id, grams) frame [[shingles]] emits.
    * Returns (id_a, id_b, common, jaccard) with id_a < id_b. */
  /** EXACT containment join — [[ppjoinExact]]'s ASYMMETRIC sibling: every
    * ORDERED pair (a, b), a ≠ b, with C(a→b) = |A∩B| / |A| ≥ num/den and
    * nothing else. Containment is the quote/subset detector resemblance
    * misses: a paragraph lifted into a 100× longer page has Jaccard
    * ~|A|/|B| ≈ 0 but containment ~1 — the decontamination and
    * quote-attribution signal (Broder 1997 distinguishes exactly these
    * two as resemblance vs containment).
    *
    * Exactness: order each doc's grams by global (df, gram) and take A's
    * prefix of length |A| − ⌈num·|A|/den⌉ + 1. If C(a→b) ≥ t then A
    * misses at most |A| − ⌈t·|A|⌉ grams of B, so at least one PREFIX gram
    * is common (pigeonhole) — candidates are A-prefix ⋈ B's full gram
    * rows, so no qualifying pair can be lost; an integer size filter
    * (den·|B| ≥ num·|A|, since C ≤ |B|/|A|) prunes before the verify.
    * All pruning arithmetic is integer; the exact |A∩B| verify decides.
    * The asymmetry is why only the CONTAINED side carries a prefix: no
    * lower bound exists on the container's share, so its full (but
    * df-rare-prefix-joined) posting rows are the candidate source — cost
    * is Σ_prefix-gram df(g), kept near-linear by df-ordering exactly as
    * in ppjoinExact.
    *
    * Returns (id_a, id_b, common, containment) — a CONTAINED in b. */
  def containmentJoin(grams: DataFrame, num: Int, den: Int,
      idCol: String = "doc_id"): DataFrame =
    // the self-join is the cross-corpus machinery applied to one corpus
    // (probe = corpus = grams; within one corpus every gram has df >= 1,
    // so the coalesce-0 ordering degenerates to the plain df order) with
    // the trivial self-pairs dropped — ONE implementation of the prefix/
    // size/verify arithmetic, so a future fix cannot drift between the
    // symmetric and cross-corpus paths
    containmentAcross(
        grams.select(col(idCol).as("__sj_id"), col("grams")), grams,
        num, den, probeIdCol = "__sj_id", corpusIdCol = idCol)
      .where(col("__sj_id") =!= col(idCol))
      .select(col("__sj_id").as("id_a"), col(idCol).as("id_b"),
        col("common"), col("containment"))

  /** [[containmentJoin]] ACROSS two corpora — the decontamination shape:
    * every (probe, corpus) pair with |P∩C| / |P| ≥ num/den, exact. The
    * probe side (benchmark passages, a delta batch, suspected quotes)
    * carries the prefix; the corpus side contributes full posting rows.
    * Prefix order is by CORPUS df (left-join + coalesce 0: a gram the
    * corpus has never seen sorts FIRST — it prunes hardest, exactly the
    * rare-quote signal), and the pigeonhole argument is order-agnostic,
    * so corpus-df ordering is a pure candidate-count optimization.
    * Returns (probeIdCol, corpusIdCol, common, containment). Unlike the
    * self-join, probe↔probe and corpus↔corpus pairs never form. */
  def containmentAcross(probe: DataFrame, corpus: DataFrame,
      num: Int, den: Int, probeIdCol: String = "probe_id",
      corpusIdCol: String = "doc_id"): DataFrame =
    containmentProbe(probe, containmentIndex(corpus, corpusIdCol),
      num, den, probeIdCol)

  /** The STATIC half of [[containmentAcross]], prepared once: exploded
    * corpus posting rows and the corpus document-frequency table — the
    * "prefix index" a long-lived decontamination service materializes
    * (cache/localCheckpoint the two frames) and probes repeatedly, e.g.
    * per streaming micro-batch ([[graft.streaming.StreamingContainment]]).
    * `corpus` keeps its (id, grams) shape for the verify gather. */
  final case class ContainmentIndex(cRows: DataFrame, dfs: DataFrame,
      corpus: DataFrame, corpusIdCol: String)

  def containmentIndex(corpus: DataFrame,
      corpusIdCol: String = "doc_id"): ContainmentIndex = {
    val cRows = corpus.where(size(col("grams")) > 0)
      .select(col(corpusIdCol).as("__cid"), size(col("grams")).as("nc"),
        explode(col("grams")).as("gram"))
    ContainmentIndex(cRows,
      cRows.groupBy(col("gram")).agg(count(lit(1)).as("df")),
      corpus, corpusIdCol)
  }

  /** The PROBE half of [[containmentAcross]]: screen `probe` against a
    * prepared [[ContainmentIndex]]. Each probe's prefix, candidates, and
    * verify depend only on its own grams and the static index — no
    * probe↔probe interaction — so a probe set split into arbitrary
    * batches yields the union of the per-batch results (the streaming
    * batch-split invariance StreamingContainmentSpec pins). */
  def containmentProbe(probe: DataFrame, index: ContainmentIndex,
      num: Int, den: Int, probeIdCol: String = "probe_id"): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must be a rational in (0, 1]: got $num/$den")
    import org.apache.spark.sql.expressions.Window
    val corpus = index.corpus
    val corpusIdCol = index.corpusIdCol
    val cRows = index.cRows
    val dfs = index.dfs
    val pRows = probe.where(size(col("grams")) > 0)
      .select(col(probeIdCol).as("__pid"), size(col("grams")).as("np"),
        explode(col("grams")).as("gram"))
    val byProbe = Window.partitionBy(col("__pid"))
      .orderBy(col("df"), col("gram"))
    def ceilDiv(x: Column): Column =
      ((x * num + (den - 1)) / den).cast("long")
    // (no partition pins here, unlike ppjoinExact: measured on q208 —
    // the probe-side flows are prefix-thin, and pinned exchanges cost
    // more than AQE coalescing saves: 1.3 s -> 2.5 s with the pins; the
    // same held for the streaming path once the batch grams were
    // materialized — r18 measured pins-on at 2x the task time of
    // pins-off for equal wall. Streaming callers MUST hand `probe` in
    // materialized (attribute-backed grams): an unmaterialized shingle
    // expression re-evaluates per row inside the emptiness guard and the
    // explode's inferred filter, below any repartition — see
    // StreamingContainment for the trap and the checkpoint treatment.)
    val pref = pRows.join(dfs, Seq("gram"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("__pos", row_number().over(byProbe))
      .where(col("__pos") <= col("np") - ceilDiv(col("np")) + 1)
      .select(col("__pid"), col("gram"), col("np"))
    val cands = pref
      .join(cRows, "gram")
      .where(col("nc") * den >= col("np") * num)
      .select(col("__pid"), col("__cid")).distinct()
    cands
      .join(probe.select(col(probeIdCol).as("__pid"),
        col("grams").as("__gp")), "__pid")
      .join(corpus.select(col(corpusIdCol).as("__cid"),
        col("grams").as("__gc")), "__cid")
      .select(col("__pid"), col("__cid"),
        size(array_intersect(col("__gp"), col("__gc"))).as("common"),
        size(col("__gp")).as("np"))
      .where(col("common") * den >= col("np") * num)
      .select(col("__pid").as(probeIdCol), col("__cid").as(corpusIdCol),
        col("common"), (col("common") / col("np")).as("containment"))
  }

  def ppjoinExact(grams: DataFrame, num: Int, den: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must be a rational in (0, 1]: got $num/$den")
    import org.apache.spark.sql.expressions.Window
    val rows = grams.where(size(col("grams")) > 0)
      .select(col(idCol).as("id"), size(col("grams")).as("n"),
        explode(col("grams")).as("gram"))
    val dfs = rows.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("id"))
      .orderBy(col("df"), col("gram"))
    // ceil(num·n/den): the dividend is an exact small integer, the
    // double quotient rounds correctly, truncation = floor for
    // positives — integer-exact for any corpus-plausible n
    def ceilDiv(x: Column): Column =
      ((x * num + (den - 1)) / den).cast("long")
    // The pair-expansion and verify stages are ROW-expensive but
    // byte-tiny (a prefix row explodes by df(gram); a verify row pays an
    // exact array intersect), so their partition counts are PINNED with
    // user repartitions on the very join keys the planner would exchange
    // on anyway — identical data movement, but AQE's byte-based
    // coalescing (which was measured folding these stages onto a handful
    // of tasks, 2× the query) cannot fold a user-specified count.
    val p = grams.sparkSession.sparkContext.defaultParallelism
    val pref = rows.join(dfs, "gram")
      .withColumn("__pos", row_number().over(byDoc))
      .where(col("__pos") <= col("n") - ceilDiv(col("n")) + 1)
      .select(col("id"), col("gram"), col("n"), col("__pos"))
      .repartition(p, col("gram"))
    // PPJoin's POSITIONAL filter (Xiao et al. 2008, public method) on
    // top of the length filter: a gram matched at (1-based, df-ordered)
    // positions pa/pb can witness an overlap of at most
    // 1 + min(na − pa, nb − pb) — everything else in the intersection
    // lies after it in BOTH docs (the global (df, gram) order is one
    // total order). Jaccard ≥ num/den needs
    // common ≥ ceil(num·(na+nb)/(num+den)), so matches whose upper
    // bound falls short drop BEFORE the pair-dedup exchange and the
    // exact-intersect verify. Sound because the EARLIEST shared gram of
    // a qualifying pair always passes (its bound ≥ the true overlap);
    // it prunes only match rows, never a qualifying pair.
    val aReq = (((col("na") + col("nb")) * num + (num + den - 1)) /
      (num + den)).cast("long")
    val cands = pref.select(col("id").as("id_a"), col("gram"),
        col("n").as("na"), col("__pos").as("pa"))
      .join(pref.select(col("id").as("id_b"), col("gram"),
        col("n").as("nb"), col("__pos").as("pb")), "gram")
      .where(col("id_a") < col("id_b") &&
        least(col("na"), col("nb")) * den >=
          greatest(col("na"), col("nb")) * num &&
        lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >=
          aReq)
      .select(col("id_a"), col("id_b"))
      // pinned for the same reason: the dedup itself is cheap, but its
      // exchange otherwise coalesces and serializes the pair stream
      .repartition(p, col("id_a"), col("id_b")).distinct()
    cands
      .join(grams.select(col(idCol).as("id_a"), col("grams").as("__ga")),
        "id_a")
      .repartition(p, col("id_b"))
      .join(grams.select(col(idCol).as("id_b"), col("grams").as("__gb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ga"), col("__gb"))).as("common"),
        size(col("__ga")).as("na"), size(col("__gb")).as("nb"))
      .where(col("common") * den >=
        (col("na") + col("nb") - col("common")) * num)
      .select(col("id_a"), col("id_b"), col("common"),
        (col("common") / (col("na") + col("nb") - col("common")))
          .as("jaccard"))
  }
}
