package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Dedup as a library: the primitives run on any frame (caller-named id
  * column, synthetic data) and compose into the find-candidates → verify →
  * cluster pipeline with known ground truth. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      (10L, base),
      (11L, base + " again"), // near-dup of 10
      (12L, base.replace("quick", "swift")), // near-dup of 10
      (20L, "completely different text about spark engines and distributed joins with partitions"),
      (21L, "completely different text about spark engines and distributed joins with partitions indeed"), // near-dup of 20
      (30L, "short text"), // < 3 tokens after nothing — actually 2 tokens: no shingles
      (31L, "one two three four five six seven eight nine ten eleven twelve unrelated entirely")
    ).toDF("item_id", "body")
  }

  test("shingles respect caller column names and minimum length") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body")
    assert(g.columns.toSeq === Seq("item_id", "grams"))
    val byId = g.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(30L).isEmpty) // 2 tokens -> no 3-grams
    assert(byId(10L).nonEmpty)
    assert(byId(10L).head.split(" ").length === 3)
  }

  test("LSH candidates -> exact verify -> clusters finds the planted groups") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body").cache()
    // 6 bands × 2 rows: the subject here is the candidates→verify→cluster
    // COMPOSITION, so the banding is tuned for recall at this fixture's
    // J≈0.73 substitution pair — under 4×3 a J=0.73 pair colliding in
    // some band is a ~60/40 draw per hash family (deterministic but
    // family-dependent), while at 6×2 the miss chance is ~7%, and this
    // family finds every planted pair (verified: the outcome is pinned,
    // not sampled).
    val bands = Dedup.minhashBands(g, idCol = "item_id", rowsPerBand = 2)
    val cands = Dedup.lshCandidates(bands, idCol = "item_id")
    val verified = Dedup.jaccardVerify(cands, g, idCol = "item_id")
      .where(col("jaccard") >= 0.5)
    val ids = corpus().select(col("item_id"))
    val labels = Dedup.clusters(ids, verified.select(col("id_a"), col("id_b")),
      idCol = "item_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted groups collapse to their minimum member
    assert(labels(10L) === 10L && labels(11L) === 10L && labels(12L) === 10L)
    assert(labels(20L) === 20L && labels(21L) === 20L)
    // singletons stay themselves
    assert(labels(30L) === 30L && labels(31L) === 31L)
  }

  test("bounded LSH candidates: a hot bucket is skipped (audited, never " +
      "silent) while clean pairs survive; a loose bound equals unbounded") {
    import spark.implicits._
    // 4 exact copies (a boilerplate crowd: every band bucket they share
    // has 4 members) + one clean near-dup pair + an unrelated doc
    val boiler = "terms of service apply to all users of this site always"
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), (4L, boiler),
      (10L, base), (11L, base + " today"),
      (30L, "an entirely different document about spark physical planning")
    ).toDF("doc_id", "text")
    val g = Dedup.shingles(docs).cache()
    val bands = Dedup.minhashBands(g, rowsPerBand = 2)
    val bounded = Dedup.lshCandidatesBounded(bands, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 4-member boilerplate buckets are over the bound: none of the
    // 6 crowd pairs appear; the 2-member clean bucket survives
    assert(bounded.contains((10L, 11L)), "clean pair lost")
    assert(!bounded.exists { case (a, b) => a <= 4 && b <= 4 },
      s"crowd pair leaked through the bound: $bounded")
    // the audit frame names exactly the skipped buckets, with membership
    val over = Dedup.lshOverflowBuckets(bands, maxBucket = 3).collect()
    assert(over.nonEmpty && over.forall(_.getLong(2) === 4L),
      "audit must carry the 4-member boilerplate buckets")
    // loose bound ≡ unbounded (the mitigation is a pure refinement)
    val all = Dedup.lshCandidates(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Dedup.lshCandidatesBounded(bands, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === all)
    assert(Dedup.lshOverflowBuckets(bands, maxBucket = 100).isEmpty)
    intercept[IllegalArgumentException](
      Dedup.lshCandidatesBounded(bands, maxBucket = 1))
  }

  test("shingle simhash separates near-dups from unrelated docs") {
    val g = Dedup.shingles(corpus(), idCol = "item_id", textCol = "body")
    val sim = Dedup.simhash(g, "grams", idCol = "item_id", bits = 32)
    val pairs = Dedup.simhashPairs(sim, idCol = "item_id",
      nBlocks = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((20L, 21L))) // single-word append: tiny hamming
    // unrelated docs never pair
    assert(!pairs.exists { case (a, b) => a / 10 != b / 10 })
  }

  test("dupSpans: exact-substring spans from shared and self-repeated text") {
    import spark.implicits._
    // All-lowercase-letter strings, so text == its normalization and char
    // offsets are stable.
    val shared = ("abcdefghijklmnopqrstuvwxyz" * 3).take(60) // 60 chars
    val y = ("zyxwvutsrqponmlkjihgfedcba" * 2).take(50) // 50 chars
    val docs = Seq(
      // 1 & 2 share exactly the 60-char prefix; suffixes are disjoint
      (1L, shared + "q" * 25),
      (2L, shared + "r" * 25),
      // 3 is Y+Y: pure self-repetition, nothing shared with others
      (3L, y + y),
      // 4: natural aperiodic text — no duplicated 40-gram anywhere
      (4L, "thequickbrownfoxjumpsoverthelazydogwhilesparkshufflespartitionsdata")
    ).toDF("doc_id", "text")
    val pos = Dedup.gramPositions(docs, k = 40).cache()
    val out = Dedup.dupSpans(pos, docs, k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // shared 60-char prefix: gram starts 0..20 in both docs -> one span of
    // exactly the prefix (40 + 20 gaps of 1); frac rounds to 6dp
    assert(out(1L) === ((21L, 1L, 60L, 0.705882)))
    assert(out(2L) === ((21L, 1L, 60L, 0.705882)))
    // Y+Y self-repetition: gram at p matches p+50 for p in 0..10; the two
    // duplicated runs are interval-adjacent and union to the whole doc
    assert(out(3L)._3 === 100L)
    assert(out(3L)._4 === 1.0)
    // clean doc: all zeros
    assert(out(4L) === ((0L, 0L, 0L, 0.0)))
  }

  test("removeDupSpans: span surgery cuts exactly the detected islands") {
    import spark.implicits._
    val shared = ("abcdefghijklmnopqrstuvwxyz" * 3).take(60)
    val y = ("zyxwvutsrqponmlkjihgfedcba" * 2).take(50)
    val clean4 =
      "thequickbrownfoxjumpsoverthelazydogwhilesparkshufflespartitionsdata"
    val docs = Seq(
      (1L, shared + "q" * 25),
      (2L, shared + "r" * 25),
      (3L, y + y), // fully duplicated: everything cut
      (4L, clean4) // untouched
    ).toDF("doc_id", "text")
    val pos = Dedup.gramPositions(docs, k = 40).cache()
    val out = Dedup.removeDupSpans(pos, docs, k = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map(b => f"$b%02x").mkString
    // docs 1/2: the 60-char shared prefix is one island; the unique tails
    // survive verbatim
    assert(out(1L) === ((1L, 25, md5("q" * 25))))
    assert(out(2L) === ((1L, 25, md5("r" * 25))))
    // doc 3 is one island covering the whole text: cleaned = empty
    assert(out(3L) === ((1L, 0, md5(""))))
    // doc 4 passes through unchanged
    assert(out(4L) === ((0L, clean4.length, md5(clean4))))
  }

  test("dedupUnits keeps the globally first occurrence, normalized") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val units = Seq(
      (1L, 0L, "shared boilerplate"),
      (1L, 1L, "unique passage one"),
      (2L, 0L, "  Shared   BOILERPLATE "), // normalizes equal to (1,0)
      (2L, 1L, "shared boilerplate"), // third copy, later idx
      (3L, 0L, "unique passage two"))
      .toDF("doc_id", "unit_idx", "unit")
    val out = Dedup.dedupUnits(units).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("unit_idx")) ->
        ((r.getAs[Long]("n_occ"), r.getAs[Boolean]("keep")))).toMap
    assert(out((1L, 0L)) === ((3L, true))) // first of the three copies
    assert(out((2L, 0L)) === ((3L, false)))
    assert(out((2L, 1L)) === ((3L, false)))
    assert(out((1L, 1L)) === ((1L, true)))
    assert(out((3L, 0L)) === ((1L, true)))
    // exactly one keeper per distinct normalized unit
    assert(out.count { case (_, (_, keep)) => keep } === 3)
  }

  test("dedupDelta: history collisions flagged, keep-first within the " +
      "batch, normalization-insensitive") {
    import spark.implicits._
    val history = Seq((1L, "Seen Before"), (2L, "also seen"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "brand new"),
      (11L, "seen   before"), // history dup modulo case/whitespace
      (12L, "repeated in delta"),
      (13L, "Repeated In Delta"), // intra-batch dup of 12
      (14L, "repeated in delta")) // and another
      .toDF("doc_id", "text")
    val out = Dedup.dedupDelta(history, delta).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_occ_delta"), r.getAs[Boolean]("in_history"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(10L) === ((1L, false, true)))
    assert(out(11L) === ((1L, true, false)))
    assert(out(12L) === ((3L, false, true))) // first of three copies
    assert(out(13L) === ((3L, false, false)))
    assert(out(14L) === ((3L, false, false)))
  }

  test("dedupDelta: NULL delta text fails loudly; digest-index history " +
      "input skips the text scan") {
    import spark.implicits._
    val history = Seq((1L, "seen")).toDF("doc_id", "text")
    val bad = Seq((10L, null: String)).toDF("doc_id", "text")
    val e = intercept[Exception](Dedup.dedupDelta(history, bad).collect())
    assert(e.getMessage.contains("dedupDelta"))
    // a persisted digest index (the production input) works directly
    val idx = history
      .select(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
        .as("__k"))
    val out = Dedup.dedupDelta(idx,
        Seq((10L, "seen"), (11L, "new")).toDF("doc_id", "text"),
        historyIsDigests = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(out === Map(10L -> false, 11L -> true))
  }

  test("dedupDelta plan: history collapses to its digest index before " +
      "the join; no window, nothing single-partition") {
    import spark.implicits._
    val history = (1L to 100L).map(i => (i, s"h $i")).toDF("doc_id", "text")
    val delta = (1L to 50L).map(i => (i, s"d ${i % 20}")).toDF("doc_id", "text")
    val qe = Dedup.dedupDelta(history, delta).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in dedupDelta plan:\n$plan")
    assert(!plan.contains("Window"),
      s"window operator in dedupDelta plan:\n$plan")
    // the distinct over history digests must sit BELOW the membership
    // join (index-sized join input, never history text): the optimized
    // plan has an Aggregate on the history branch feeding the join
    val optimized = qe.optimizedPlan.toString
    assert(optimized.contains("Aggregate"),
      s"no aggregate (digest distinct) in optimized plan:\n$optimized")
  }

  test("dedupUnits plan: keyed aggregation + join, nothing global") {
    import spark.implicits._
    val units = (1L to 200L).map(i => (i, 0L, s"unit ${i % 50}"))
      .toDF("doc_id", "unit_idx", "unit")
    val plan = Dedup.dedupUnits(units).queryExecution.executedPlan.toString
    // the frequency aggregation and keep-join must shuffle by the unit
    // digest — never a partition-less window or a single-partition
    // exchange (the shapes that collapse a corpus onto one task)
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in dedupUnits plan:\n$plan")
    assert(!plan.contains("Window"),
      s"window operator in dedupUnits plan:\n$plan")
  }

  test("cdcChunks: boundaries follow content — an early edit re-cuts " +
      "only its own chunk; short docs yield one chunk") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight while stars shine"
    val edited = "XYZPREFIX " + base // insertion at the front
    val out = Dedup.cdcChunks(
      Seq((1L, base), (2L, edited), (3L, "tiny")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(3L)._2 === 1L, "short doc: no window, one chunk")
    // the edited doc's boundary SET shifts by the insertion length in
    // the prefix region but the CONTENT-defined cut points re-align:
    // the suffix after the first shared boundary chunks identically, so
    // the two docs share most boundary-relative structure. Pin the
    // cheap invariants: both chunk, deterministically.
    assert(out(1L)._2 >= 2L, s"base should chunk: ${out(1L)}")
    val again = Dedup.cdcChunks(
      Seq((1L, base)).toDF("doc_id", "text")).collect().head.getString(3)
    assert(again === out(1L)._3, "digest deterministic")
  }
}
