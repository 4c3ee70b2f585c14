package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev measurement harness (not a test): the SKEW-STRESS companion to
  * [[ScaleElasticity]]. That harness measures uniform hash-seeded corpora;
  * real crawls are Zipfian — boilerplate template pages produce hot LSH
  * buckets, one giant domain produces hot join/aggregate keys. This
  * harness generates Zipf-shaped corpora (log-uniform draws ≈ Zipf s=1)
  * at 1× and 10× and measures each mitigation AGAINST the naive path it
  * replaces, plus the occupancy metric (max bucket / max reducer rows)
  * that explains the gap:
  *
  *   - MinHash-LSH banding, naive `lshCandidates` (unbounded buckets) vs
  *     exact-digest collapse-before-banding (q158's two-level shape: a
  *     template duplicated T times contributes T·(T−1)/2 pairs per band
  *     naive, but 1 representative collapsed — the exact level recovers
  *     the T-group membership by digest join, linear).
  *   - A Zipfian-key fact⋈dim join: plain shuffle join with AQE skew
  *     handling OFF, the same with AQE skew-join ON, and
  *     [[SkewJoin.salted]] — the two mitigation layers the engine ships.
  *   - The hot-key aggregate, plain: map-side partial aggregation is the
  *     built-in mitigation (each task pre-folds its slice of the hot key;
  *     the exchange carries one partial row per task per key).
  *
  * Usage: sbt "Test/runMain graft.analytics.SkewStress [probePrefix]"
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("skew-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("graft_skew").toString

    /** Log-uniform integer in [1, max] from a hash seed: P(k ≤ x) =
      * ln x / ln max, density ∝ 1/k — Zipf s≈1 without a driver loop. */
    def zipf(seed: org.apache.spark.sql.Column, max: Int) = {
      val u = (pmod(xxhash64(seed), lit(1000000)).cast("double") + 0.5) / 1e6
      greatest(lit(1L), pow(lit(max.toDouble), u).cast("long"))
    }

    /** Boilerplate-heavy Zipfian corpus: 50% of docs are EXACT copies of
      * one of just TWO templates (the hot-bucket source — think a
      * crawl's dominant error/empty boilerplate page; at 10× each
      * template's band bucket holds ~12.5k docs, so the naive pair join
      * faces ~78M pairs per bucket per band, all on the ONE task that
      * owns that band key), 5% are 1-token mutations of a template (true
      * near-dups the LSH must still find), 45% unique bodies with
      * Zipfian token draws. */
    def genDocs(n: Long, path: String): Unit = {
      def body(seed: org.apache.spark.sql.Column) = concat_ws(" ",
        transform(sequence(lit(1), lit(120)),
          i => concat(lit("w"), zipf(seed * 1000 + i, 5000))))
      val tmpl = pmod(xxhash64(col("id")), lit(2))
      spark.range(n).select(col("id").as("doc_id"),
        concat(lit("d"), zipf(xxhash64(col("id") * 7 + 3), 1000))
          .as("domain"),
        when(col("id") % 20 < 10, body(tmpl - 100))           // exact copy
          .when(col("id") % 20 === 10, concat(body(tmpl - 100), // near-dup
            lit(" mut"), col("id")))
          .otherwise(body(col("id"))).as("text"))
        .write.mode("overwrite").parquet(path)
    }

    def time(name: String, scale: String)(work: => Unit): Double = {
      val t0 = System.nanoTime()
      work
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $name%-22s $scale%-4s $s%7.1f s")
      s
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double)]
    def run(name: String, t1: Double, t10: Double): Unit = {
      results(name) = (t1, t10)
      println(f"[skew] $name%-22s ratio ${t10 / t1}%5.2f×")
    }

    for ((tag, nd) <- Seq(("1x", 5000L), ("10x", 50000L)))
      genDocs(nd, s"$base/docs_$tag")
    def docs(tag: String) = spark.read.parquet(s"$base/docs_$tag")

    // occupancy diagnostics (cheap keyed counts, printed once per scale)
    def diag(tag: String): Unit = {
      val bands = Dedup.minhashBands(Dedup.shingles(docs(tag)))
      val maxBucket = bands.groupBy("band", "band_key").count()
        .agg(max("count")).head.getLong(0)
      val maxDomain = docs(tag).groupBy("domain").count()
        .agg(max("count")).head.getLong(0)
      val maxFactKey = genJoin(tag)._1.groupBy("key").count()
        .agg(max("count")).head.getLong(0)
      val n = docs(tag).count()
      println(s"[skew] diag $tag: n=$n maxBandBucket=$maxBucket " +
        s"maxDomainRows=$maxDomain maxFactKeyRows=$maxFactKey")
    }

    // LSH naive: unbounded band buckets — each T-sized template bucket
    // contributes T·(T−1)/2 pairs per band before the distinct
    def lshNaive(tag: String): Unit = {
      val bands = Dedup.minhashBands(Dedup.shingles(docs(tag)))
      force(Dedup.lshCandidates(bands))
    }
    // two-level: collapse exact duplicates to their min-id representative
    // (one digest aggregate, linear), band only representatives; the
    // exact level's digest groups carry the collapsed membership
    def lshCollapsed(tag: String): Unit = {
      val d = docs(tag).withColumn("dig",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      val reps = d.groupBy("dig").agg(min("doc_id").as("doc_id"))
        .join(d, Seq("dig", "doc_id"))
      val bands = Dedup.minhashBands(Dedup.shingles(reps))
      force(Dedup.lshCandidates(bands))
    }

    // bounded buckets: keep banding the RAW corpus but skip buckets past
    // maxBucket (Dedup.lshCandidatesBounded + the q167 audit) — the
    // mitigation when the hot mass is NEAR-duplicate (distinct digests),
    // which exact-collapse cannot fold
    def lshBounded(tag: String): Unit = {
      val bands = Dedup.minhashBands(Dedup.shingles(docs(tag)))
      force(Dedup.lshCandidatesBounded(bands, maxBucket = 64))
    }

    // Skew-key join: facts (n·1000 rows; 30% pinned on key 1 — "one giant
    // domain" — the rest Zipf over n/5 keys) ⋈ a dim the probe forces
    // through a shuffle join (merge hint; broadcasting the small dim is
    // the FIRST answer — this measures the path for when the dim isn't
    // small). The hot reducer sees ~10× an average partition's rows.
    def genJoin(tag: String): (DataFrame, DataFrame) = {
      val n = if (tag == "10x") 50000L else 5000L
      val facts = spark.range(n * 1000).select(col("id").as("fact_id"),
        when(pmod(xxhash64(col("id") * 3 + 1), lit(10)) < 3, lit(1L))
          .otherwise(zipf(xxhash64(col("id") * 11 + 5), (n / 5).toInt))
          .as("key"),
        pmod(xxhash64(col("id")), lit(97)).as("payload"))
      val dim = spark.range(1, n / 5 + 1).select(col("id").as("key"),
        concat(lit("attr"), pmod(xxhash64(col("id")), lit(13))).as("attr"))
      (facts, dim)
    }
    def joinForced(tag: String, skewAqe: Boolean): Unit = {
      val (facts, dim) = genJoin(tag)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewAqe)
      try force(facts.join(dim.hint("merge"), "key")
        .groupBy("attr").agg(sum("payload").as("s")))
      finally
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    }
    def joinSalted(tag: String): Unit = {
      val (facts, dim) = genJoin(tag)
      force(SkewJoin.salted(facts, dim, "key", nSalts = 8,
        saltCols = Seq("fact_id"))
        .groupBy("attr").agg(sum("payload").as("s")))
    }

    // hot-key aggregate: the built-in mitigation is partial aggregation —
    // included to SHOW the flat ratio, not to fix anything
    def hotAgg(tag: String): Unit =
      force(docs(tag).groupBy("domain")
        .agg(count(lit(1)).as("docs"),
          sum(length(col("text"))).as("chars")))

    val probes: Seq[(String, String => Unit)] = Seq(
      ("lsh_naive", lshNaive _),
      ("lsh_collapsed", lshCollapsed _),
      ("lsh_bounded", lshBounded _),
      ("join_plain_noskewaqe", (t: String) => joinForced(t, skewAqe = false)),
      ("join_plain_skewaqe", (t: String) => joinForced(t, skewAqe = true)),
      ("join_salted", joinSalted _),
      ("hot_agg", hotAgg _))
    val selected = args.headOption
      .map(p => probes.filter(_._1.startsWith(p))).getOrElse(probes)

    Seq("1x", "10x").foreach(diag)
    selected.foreach { case (name, f) =>
      run(name, time(name, "1x")(f("1x")), time(name, "10x")(f("10x")))
    }

    println("[skew] summary (name, 1x s, 10x s, ratio):")
    results.foreach { case (n, (a, b)) =>
      println(f"[skew]   $n%-22s $a%7.1f $b%7.1f ${b / a}%5.2f×")
    }
    spark.stop()
  }
}
