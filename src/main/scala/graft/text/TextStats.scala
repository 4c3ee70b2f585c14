package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis primitives as a library over caller-named columns: token
  * and quality statistics, language identification, token-count
  * estimators, and normalization fingerprints. All counts are codegen'd
  * regexp primitives (a token is exactly an [a-z0-9]+ run), never
  * per-token lambda evaluation — the hot shape for corpus-scale scoring.
  * The driver-verified queries (q21/q22/q23/q54) apply these to the
  * testdata `documents` table; their DuckDB oracles pin the semantics. */
object TextStats {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with")

  /** Adds n_tokens, avg_token_len, stop_ratio, n_punct, text_len, quality. */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lowered = lower(col(textCol))
    val stopPat = "\\b(?:" + Stopwords.mkString("|") + ")\\b"
    docs
      .withColumn("n_tokens",
        size(regexp_extract_all(lowered, lit("[a-z0-9]+"), lit(0))))
      .withColumn("__alnum_len",
        length(regexp_replace(lowered, "[^a-z0-9]+", "")))
      .withColumn("__n_stop",
        size(regexp_extract_all(lowered, lit(stopPat), lit(0))))
      .withColumn("n_punct", size(split(col(textCol), "[.,;:!?]")) - 1)
      .withColumn("text_len", length(col(textCol)))
      .withColumn("avg_token_len",
        col("__alnum_len").cast("double") / nullif(col("n_tokens"), lit(0)))
      .withColumn("stop_ratio",
        col("__n_stop").cast("double") / nullif(col("n_tokens"), lit(0)))
      .withColumn("quality",
        lit(0.5) * least(lit(1.0), col("n_tokens") / 100.0) +
          lit(0.3) * col("stop_ratio") +
          lit(0.2) * least(lit(1.0), col("avg_token_len") / 8.0))
      .drop("__alnum_len", "__n_stop")
  }

  private val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(?:the|and|of|to|in|that)\\b",
    "de" -> "\\b(?:der|die|und|das|ist|nicht)\\b",
    "fr" -> "\\b(?:le|les|et|des|une|est)\\b",
    "es" -> "\\b(?:el|los|y|que|una|como)\\b")

  /** Adds c_<lang> marker counts and predicted_lang (deterministic argmax,
    * earlier language wins ties). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lowered = lower(col(textCol))
    val withCounts = LangMarkers.foldLeft(docs) { case (df, (l, pat)) =>
      df.withColumn(s"c_$l",
        size(regexp_extract_all(lowered, lit(pat), lit(0))))
    }
    val langs = LangMarkers.map(_._1)
    val argmax = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), rest) =>
        val laterMax = langs.drop(i + 1)
          .map(o => col(s"c_$l") >= col(s"c_$o")).reduce(_ && _)
        when(laterMax, l).otherwise(rest)
    }
    withCounts.withColumn("predicted_lang", argmax)
  }

  /** Adds n_ws_tokens (whitespace), n_bpe_tokens (GPT-2-ish pre-tokenizer
    * regex: letter runs | single digits | single symbols), est_tokens
    * (chars/4 rule of thumb over `charsCol`). */
  def tokenEstimates(docs: DataFrame, textCol: String = "text",
      charsCol: String = "n_chars"): DataFrame =
    docs
      .withColumn("n_ws_tokens",
        size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))))
      .withColumn("est_tokens",
        ceil(col(charsCol) / 4.0).cast("long"))

  /** Normalized-content digest: whitespace/case/punctuation-insensitive
    * near-exact dedup key. */
  def fingerprint(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")))

  /** Gopher-style repetition statistics — the standard "remove
    * machine-generated / boilerplate-heavy text" quality gates for
    * training-corpus preparation: per document,
    *  - `top2_frac`: the most frequent word 2-gram's share of all 2-gram
    *    occurrences (high = one phrase dominates), and
    *  - `dup3_frac`: the share of word-3-gram occurrences whose gram
    *    repeats within the document (high = internally repetitive).
    *
    * Shape: overlapping n-grams (occurrences, NOT the distinct shingle
    * set — repetition is the signal here) explode to (doc, gram) rows and
    * aggregate twice keyed by doc_id, so the whole computation shards by
    * document; nothing is corpus-global. Documents with fewer than n
    * tokens have no n-grams and drop out (mirrored by the oracle's inner
    * joins). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // tokenize ONCE behind an exchange barrier (the Dedup.simhash
    // pattern): the gram lambdas below read element_at(toks, …) several
    // times per window, and without the barrier CollapseProject inlines
    // the full tokenizer into each read. The sub-n-token guard is a
    // when/otherwise inside the explode — NOT a `.where`, which the
    // optimizer would push below the exchange as a filter that re-runs
    // the tokenizer AND makes each branch's exchange subtree distinct;
    // guarded this way, the n_words/2-gram/3-gram branches are canonically
    // identical below the explode and AQE executes ONE tokenizer stage.
    val base = docs
      .select(col(idCol), graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .repartition(col(idCol))
    def gramRows(n: Int) = base
      .select(col(idCol),
        explode(when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(o => element_at(col("toks"), i + o)): _*)))
          .otherwise(array().cast("array<string>")))
          .as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    val top2 = gramRows(2).groupBy(col(idCol))
      .agg(round(max(col("c")) / sum(col("c")), 6).as("top2_frac"))
    val dup3 = gramRows(3).groupBy(col(idCol))
      .agg(round(
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0))) / sum(col("c")),
        6).as("dup3_frac"))
    base.select(col(idCol), size(col("toks")).as("n_words"))
      .join(top2, idCol).join(dup3, idCol)
  }

  /** Winnowing fingerprints (the MOSS rolling-window scheme): hash every
    * character k-gram of the normalized text, then keep the minimum hash
    * of each sliding window of `w` consecutive k-grams — guaranteeing any
    * shared substring of length ≥ k+w-1 contributes a shared fingerprint,
    * while storing ~1/w of the hashes. Fingerprints are polynomial k-gram
    * hashes (`array<long>`, see
    * [[graft.functions.WinnowFingerprints]]) — integer arithmetic both
    * engines reproduce bit-for-bit, fused into ONE native codegen'd pass
    * (the earlier md5-per-position HOF formulation paid an interpreted
    * lambda frame plus a digest-string allocation per character and was
    * q63/q64's dominant cost). A pure map stage: one projection, no
    * exchanges. */
  def winnowing(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 8, w: Int = 4): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9]+", "")
    docs.select(col(idCol),
      graft.functions.WinnowFingerprints(k, w)(norm)
        .as("fingerprints"))
  }

  /** Bigram language-model quality score — the tokenizer-free analog of
    * perplexity filtering (CCNet / Gopher pipelines score documents under
    * a reference LM and drop the tails): trains an add-one-smoothed bigram
    * model ON THE CORPUS ITSELF in one pass, then scores every document by
    * its average bigram log-probability
    * `avg_logp = (1/n) · Σ ln((c₂(w₁,w₂)+1) / (c₁(w₁)+V))`.
    * Boilerplate and within-corpus-typical text scores high; statistically
    * anomalous token sequences (mojibake, wrong-language, random strings)
    * score low. Returns `(id, n_bigrams, avg_logp)` for documents with
    * ≥ 2 tokens, `avg_logp` rounded to 6dp.
    *
    * Scale shape: the model IS two count tables — unigrams (vocabulary-
    * sized) and observed bigrams (corpus-bounded, vocabulary²-capped) —
    * both built by partial-aggregated shuffles on their own keys, never
    * collected; scoring joins doc-local bigram counts to the model by
    * (w₁,w₂) and w₁ equi-keys; the only global state is the 1-row
    * vocabulary size, broadcast. Every stage is linear in corpus size, so
    * the same plan trains-and-scores at 100 TB (or trains on a sample via
    * a `.sample` on `docs` — the counts stay mergeable). */
  def bigramLmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // tokenize once behind an exchange barrier (the repetitionStats
    // pattern); the bigram and unigram branches read the SAME exchange via
    // ReuseExchange — the sub-2-token guard is a when/otherwise inside the
    // explode (explode drops empty arrays) rather than a Filter node,
    // which would push below the exchange and break subtree identity
    val base = docs
      .select(col(idCol), graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .repartition(col(idCol))
    // doc-grain counts MATERIALIZED before the fan-out (guide §5, the
    // q180/q161 treatment): docBi feeds the corpus model AND the final
    // scoring join, and exchange reuse only dedupes up to the
    // repartition — the tokenize+explode+partial-agg above it re-ran
    // once per consumer (measured on q182's twin; see knBigramScore)
    val docBi = graft.analytics.Graphs.flatCheckpoint(base
      .select(col(idCol),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c")))
    // the model: corpus bigram counts fold FROM the doc-local counts (one
    // more partial-aggregated shuffle, no second tokenizer pass)
    val corpusBi = docBi.groupBy(col("w1"), col("w2"))
      .agg(sum(col("__c")).as("__c2"))
    // the when-wrap (a no-op: toks is never null) stops
    // InferFiltersFromGenerate from pushing a `size(tokenize(text)) > 0`
    // filter below the exchange, which would re-run the tokenizer in the
    // filter and make this branch's exchange subtree differ from docBi's —
    // wrapped, all four model branches reuse ONE tokenizer stage.
    // uni is checkpointed too: its two consumers (the lp join's
    // broadcast build and the vocab row) otherwise each re-ran the
    // token explode+agg above the reused exchange (r19 probe: two
    // 0.4 s broadcast-build stages on a 5k-doc corpus).
    val uni = graft.analytics.Graphs.flatCheckpoint(base
      .select(explode(when(col("toks").isNotNull, col("toks"))
        .otherwise(array().cast("array<string>"))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("__c1")))
    // V = the unigram table's row count — no extra pass over the corpus
    val vocab = uni.agg(count(lit(1)).as("__v"))
    // assemble the model at TYPE grain first (guide §2.3: the per-type
    // log-probability needs only corpusBi ⋈ uni ⋈ vocab — all
    // type/vocabulary-sized), then join the DOC-grain counts ONCE; the
    // pre-r18 shape joined docBi by (w1,w2) and AGAIN by w1, shuffling
    // the corpus-sized doc-grain table twice. Per-term arithmetic is
    // bit-identical (same ln over the same integers).
    val lp = corpusBi
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        log((col("__c2") + lit(1.0)) / (col("__c1") + col("__v")))
          .as("__lp"))
    docBi
      .join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_bigrams"),
        round(sum(col("__c") * col("__lp")) / sum(col("__c")), 6)
          .as("avg_logp"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing real perplexity filters use — CCNet-style pipelines score
    * with KN-smoothed LMs, not add-one, because add-one crushes the
    * probability of every frequent continuation):
    *
    *   p(w2|w1) = max(c(w1w2) − D, 0)/c(w1•)
    *              + (D·N1+(w1•)/c(w1•)) · (N1+(•w2)/T)
    *
    * with fixed discount D = 0.75 (exactly double-representable),
    * N1+(w1•)/N1+(•w2) the distinct right/left continuation counts, and
    * T the total distinct-bigram-type count. Returns (id, n_bigrams,
    * avg_logp) like [[bigramLmScore]] — the two scorers differ ONLY in
    * the smoothing, so their disagreement ranks exactly the documents
    * whose bigrams are frequent-but-predictable vs rare-but-novel.
    *
    * Scale shape identical to [[bigramLmScore]]: one tokenizer stage
    * behind an exchange barrier, model tables fold from the doc-local
    * counts (bigram-type-bounded, partial-aggregated), the only global
    * state is the broadcast 1-row type count. Every model quantity is an
    * integer count, so the oracle replays the arithmetic exactly. */
  def knBigramScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol), graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .repartition(col(idCol))
    // doc-grain counts MATERIALIZED before the fan-out (guide §5, the
    // q180/q161 treatment): docBi feeds the corpus model AND the final
    // scoring join, and the exchange-reuse barrier only dedupes up to
    // the repartition — the tokenize+explode+partial-agg above it
    // re-ran once per consumer (the r18 driver run regressed q182 22%
    // on exactly this; the r19 probe put ~28 s of task time behind a
    // 5k-doc corpus). One checkpoint, one explode pass.
    val docBi = graft.analytics.Graphs.flatCheckpoint(base
      .select(col(idCol),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c")))
    // corpusBi has FOUR consumers (leftStats, rightCont, types, lp) —
    // same treatment, type-grain-sized blocks
    val corpusBi = graft.analytics.Graphs.flatCheckpoint(
      docBi.groupBy(col("w1"), col("w2"))
        .agg(sum(col("__c")).as("__c2")))
    // left-context totals AND distinct right continuations in one pass
    // (corpusBi rows are distinct (w1, w2), so count(*) = N1+(w1•))
    val leftStats = corpusBi.groupBy(col("w1"))
      .agg(sum(col("__c2")).as("__cw1"), count(lit(1)).as("__n1f"))
    val rightCont = corpusBi.groupBy(col("w2"))
      .agg(count(lit(1)).as("__n1b"))
    val types = corpusBi.agg(count(lit(1)).as("__t"))
    val d = lit(0.75)
    val p = greatest(col("__c2") - d, lit(0.0)) / col("__cw1") +
      (d * col("__n1f") / col("__cw1")) * (col("__n1b") / col("__t"))
    // model assembled at TYPE grain, doc-grain counts joined ONCE — the
    // bigramLmScore treatment (guide §2.3): the pre-r18 shape shuffled
    // the doc-grain table three times (by (w1,w2), by w1, by w2); the
    // per-term ln(p) is bit-identical either way.
    val lp = corpusBi
      .join(leftStats, "w1")
      .join(rightCont, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), log(p).as("__lp"))
    docBi
      .join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_bigrams"),
        round(sum(col("__c") * col("__lp")) / sum(col("__c")), 6)
          .as("avg_logp"))
  }

  /** BM25 document ranking against a literal query-token set (Robertson/
    * Lucene form: `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`, tf saturation
    * `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`). Returns
    * `(id, n_hit, score)` for every document containing ≥1 query token —
    * inverted-index semantics — with `score` rounded to 6dp.
    *
    * Scale shape: the token explode filters to the query set BEFORE the
    * (id, token) count shuffle, so only query-token occurrences — a
    * vanishing fraction of the corpus — ever reach an exchange; document
    * length is a codegen'd regexp count (no explode); `df` and the corpus
    * aggregate (N, avgdl) are query-set-sized and 1-row frames, both
    * broadcast. No corpus-global state beyond two scalars. */
  def bm25(docs: DataFrame, queryTokens: Seq[String], k1: Double = 1.5,
      b: Double = 0.75, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    // defaults chosen exactly double-representable (k1+1 = 2.5,
    // 1−b = 0.25), so an oracle writing the evaluated constants as
    // literals reproduces the arithmetic bit-for-bit
    val lowered = lower(col(textCol))
    val dl = docs.select(col(idCol),
      size(regexp_extract_all(lowered, lit("[a-z0-9]+"), lit(0))).as("__dl"))
    val corpus = dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val tf = docs
      .select(col(idCol),
        explode(graft.dedup.Dedup.tokens(col(textCol))).as("__tok"))
      .where(col("__tok").isin(queryTokens: _*))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val df = tf.groupBy(col("__tok"))
      .agg(countDistinct(col(idCol)).as("__df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    val sat = col("__tf") * (k1 + 1) /
      (col("__tf") + lit(k1) *
        (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    tf.join(broadcast(df), "__tok")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .select(col(idCol), (idf * sat).as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"), round(sum(col("__s")), 6).as("score"))
  }

  /** Sliding-window token chunking — the embedding/RAG preparation step:
    * split each document into `size`-token windows starting every
    * `stride` tokens (`stride < size` ⇒ overlapping context at the
    * seams; the final window clips at the document end). Emits one row
    * per chunk: `(idCol, chunk_id, ctoks)`. Empty documents emit no
    * chunks. A single codegen'd tokenize → transform(sequence) → explode
    * per row: document-local, shuffle-free, output volume bounded by
    * input × size/stride. */
  def chunk(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 64, stride: Int = 48)
      : DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol), graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(when(org.apache.spark.sql.functions.size(col("toks")) >= 1,
          transform(
            sequence(lit(0L),
              floor((org.apache.spark.sql.functions.size(col("toks")) - 1) /
                stride).cast("long")),
            i => struct(i.cast("long").as("chunk_id"),
              slice(col("toks"), i * stride + 1, lit(size)).as("ctoks"))))
          .otherwise(array().cast(
            "array<struct<chunk_id:bigint,ctoks:array<string>>>")))
          .as("c"))
      .select(col(idCol), col("c.chunk_id").as("chunk_id"),
        col("c.ctoks").as("ctoks"))
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): how much more likely is this document under
    * a TARGET-domain language model than under the raw-corpus model?
    * Selecting the top of this score tilts a 100 TB crawl toward a target
    * distribution (a curated subset, a domain, a language) without
    * hand-written rules. Both models are the add-one-smoothed bigram LMs
    * of [[bigramLmScore]] — the target model trains on the rows where
    * boolean `targetCol` is true, the raw model on everything — and the
    * score is the length-normalized log ratio
    * `avg_logp_target − avg_logp_raw` (positive = more target-like than
    * the corpus baseline).
    *
    * Returns `(idCol, n_bigrams, logratio)` for documents with ≥ 2
    * tokens, `logratio` rounded to 6dp.
    *
    * Scale shape inherited from [[bigramLmScore]]: one tokenizer pass
    * behind an exchange barrier, both models are partial-aggregated count
    * tables (the target's a filtered re-aggregation of the SAME doc-local
    * counts — no second tokenize), vocabulary sizes are one broadcast
    * 1-row frame, and scoring joins by (w1,w2)/w1 equi-keys. Bigrams and
    * first-words the target never saw fall back to the smoothing floor
    * (`ln(1/V_t)`-shaped) via left joins — exactly the model's unseen-
    * event probability, not a special case. */
  def dsirLogRatio(docs: DataFrame, targetCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol), col(targetCol).cast("boolean").as("__tgt"),
        graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
      .repartition(col(idCol))
    // doc-local bigram counts, ONE explode (the bigramLmScore shape),
    // MATERIALIZED before the fan-out — three consumers (rawBi, tgtBi,
    // the final scoring join) otherwise re-ran the explode+partial-agg
    // each (guide §5; see knBigramScore)
    val docBi = graft.analytics.Graphs.flatCheckpoint(base
      .select(col(idCol), col("__tgt"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
      .select(col(idCol), col("__tgt"), col("b.w1").as("w1"),
        col("b.w2").as("w2"))
      .groupBy(col(idCol), col("__tgt"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c")))
    // raw + target bigram models fold FROM the doc-local counts
    val rawBi = docBi.groupBy(col("w1"), col("w2"))
      .agg(sum(col("__c")).as("__c2r"))
    val tgtBi = docBi.where(col("__tgt"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("__c")).as("__c2t"))
    // unigram counts over ALL token occurrences (the LM denominators)
    // the when-wrap (a no-op: toks is never null) keeps this branch's
    // exchange subtree identical to docBi's — see bigramLmScore.
    // BOTH models' unigram tables and both vocabulary sizes fold from
    // ONE checkpointed keyed aggregate (r19): the pre-r19 shape ran the
    // token explode three times (rawUni, tgtUni, vocab — the vocab leg
    // a distinct over every occurrence); the counts are identical
    // integers (per-w1 conditional count = the filtered group count;
    // row counts = the distinct counts), so the arithmetic is
    // bit-for-bit the model it always was.
    val toks = base.select(col("__tgt"),
      explode(when(col("toks").isNotNull, col("toks"))).as("w1"))
    val uniStats = graft.analytics.Graphs.flatCheckpoint(
      toks.groupBy(col("w1")).agg(count(lit(1)).as("__c1r"),
        count(when(col("__tgt"), lit(1))).as("__c1t")))
    val rawUni = uniStats.select(col("w1"), col("__c1r"))
    val tgtUni = uniStats.where(col("__c1t") > 0)
      .select(col("w1"), col("__c1t"))
    val vocab = uniStats.agg(
      count(lit(1)).as("__vr"),
      count(when(col("__c1t") > 0, lit(1))).as("__vt"))
    // an empty target (zero rows with targetCol true) makes every
    // denominator 0 + __vt=0 → lpT = ln(1/0) = +Inf for EVERY row and
    // the downstream selection silently degrades to the id tiebreak;
    // fail loudly instead (the weightedPriority/packByBudget contract)
    val lpT = when(col("__vt") > 0,
      log((coalesce(col("__c2t"), lit(0L)) + lit(1.0)) /
        (coalesce(col("__c1t"), lit(0L)) + col("__vt"))))
      .otherwise(raise_error(lit(
        "dsirLogRatio: target set is empty — no row has " +
          s"$targetCol = true")))
    val lpR = log((col("__c2r") + lit(1.0)) / (col("__c1r") + col("__vr")))
    // both models assembled at TYPE grain (rawBi holds every observed
    // bigram type, so the left/inner join pattern is unchanged), then
    // the doc-grain counts join ONCE — the bigramLmScore/knBigramScore
    // r18 treatment: the pre-r18 shape shuffled the corpus-sized
    // doc-grain table by (w1,w2) and again by w1. Per-term lr is
    // bit-identical (same ln over the same integers).
    val lr = rawBi
      .join(tgtBi, Seq("w1", "w2"), "left")
      .join(rawUni, Seq("w1"))
      .join(tgtUni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), (lpT - lpR).as("__lr"))
    docBi
      .join(lr, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_bigrams"),
        round(sum(col("__c") * col("__lr")) / sum(col("__c")), 6)
          .as("logratio"))
  }

  /** Gopher-style document quality gates (Rae et al. 2021 §A.1.1, the
    * rule battery MassiveText applies before any model-based filtering):
    * per document,
    *  - `gate_words`: whitespace word count in [minWords, maxWords],
    *  - `gate_word_len`: mean word length in [3, 10] characters,
    *  - `gate_stop`: at least 2 DISTINCT common stopwords present (the
    *    "is this running prose" check),
    *  - `gate_alpha`: ≥ 80% of words contain at least one alphabetic
    *    character,
    * and `pass` = the conjunction. The diagnostic measurements
    * (`n_words`, `mean_word_len`, `n_stop_distinct`, `alpha_frac`) ride
    * along so a pipeline can tune thresholds from one scan.
    *
    * Pure per-row array arithmetic over ONE split — no explode, no
    * shuffle, codegen'd end to end; the natural pre-filter in front of
    * the heavier scorers ([[quality]], [[bigramLmScore]]) at corpus
    * scale. Empty documents (zero words) fail every ratio gate by
    * definition (ratios are null-safe to 0). */
  def gopherGates(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val nw = size(col("__words"))
    docs
      .withColumn("__words", words)
      .withColumn("n_words", nw)
      .withColumn("mean_word_len",
        round(aggregate(col("__words"), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / nullif(nw.cast("double"), lit(0.0)), 6))
      .withColumn("n_stop_distinct",
        size(array_intersect(
          transform(col("__words"), w => lower(w)),
          array(Stopwords.map(lit): _*))))
      .withColumn("alpha_frac",
        round(size(filter(col("__words"), w => w.rlike("[A-Za-z]")))
          .cast("double") / nullif(nw.cast("double"), lit(0.0)), 6))
      .withColumn("gate_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("gate_word_len",
        coalesce(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0,
          lit(false)))
      .withColumn("gate_stop", col("n_stop_distinct") >= 2)
      .withColumn("gate_alpha",
        coalesce(col("alpha_frac") >= 0.8, lit(false)))
      .withColumn("pass",
        col("gate_words") && col("gate_word_len") && col("gate_stop") &&
          col("gate_alpha"))
      .drop("__words")
  }

  /** Per-document character-level Shannon entropy (nats, round-6) over
    * the lowercased text — the gibberish/junk detector the regex gates
    * miss: base64 blobs and compressed garbage sit near ln(alphabet)
    * (≈ 4+ nats), natural language near ~3, single-char spam near 0.
    * Scale shape: one explode → (doc, char) keyed aggregate with
    * map-side partials (≤ distinct-chars-per-doc rows per partition
    * reach the exchange) + a doc-keyed total join. Entropy term order is
    * engine-dependent, hence the round-6 (the engine-wide float
    * convention). Caveat: characters are UTF-16 code units on the JVM
    * and code points in the SQL oracle — identical on BMP-only corpora
    * (this testdata: verified zero non-BMP), and the oracle hash is the
    * tripwire if that drifts. */
  def charEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "")).as("c"))
      .where(length(col("c")) > 0)
      .groupBy(col(idCol), col("c")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(idCol))
      .agg(sum(col("n")).as("n_chars_total"),
        count(lit(1)).as("n_distinct"))
    counts.join(totals, idCol)
      .groupBy(col(idCol), col("n_chars_total"), col("n_distinct"))
      .agg(round(-sum((col("n") / col("n_chars_total")) *
        log(col("n") / col("n_chars_total"))), 6).as("entropy"))
  }
}
