package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tokenizer-training primitive: byte-pair-encoding merge-candidate
  * statistics (Sennrich et al. 2016, public method). One BPE training
  * step ranks adjacent symbol pairs by corpus frequency and merges the
  * winner; this computes that ranking at the character level.
  *
  * Scale shape — the standard BPE trick: pair counting runs over the
  * DISTINCT word vocabulary weighted by word frequency, never over the
  * corpus token stream. A 100 TB corpus has trillions of tokens but a
  * vocabulary in the tens of millions, so the expensive explode touches
  * vocabulary-sized data; the only corpus-sized stage is the word-count
  * aggregation, which partial-aggregates map-side (a token is ~10 bytes
  * of shuffle per DISTINCT word per partition, not per occurrence). */
object Bpe {

  /** (word, freq): the corpus word-frequency vocabulary. Tokens are the
    * engine-wide lowercased alnum runs ([[graft.dedup.Dedup.tokens]]). */
  def vocabulary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(graft.dedup.Dedup.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair frequencies over the vocabulary, weighted by
    * word frequency — the merge-candidate ranking of one BPE training
    * step. A word of length L contributes its L−1 overlapping 2-grams,
    * each weighted by the word's corpus count ("aaa" contributes "aa"
    * twice, the standard occurrence-counting semantics). Returns
    * (pair, cnt) for the `topK` most frequent pairs, ties broken by the
    * pair itself — deterministic, engine-portable. The top-k plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver). */
  def pairStats(docs: DataFrame, textCol: String = "text",
      topK: Int = 20): DataFrame = {
    val pairs = vocabulary(docs, textCol)
      .where(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
    pairs
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** The ITERATIVE BPE trainer: `nMerges` greedy merge steps, returning
    * the learned merge table (step, l, r, cnt) — the artifact a
    * tokenizer consumes. Each step counts adjacent symbol pairs over the
    * persisted vocabulary (a vocabulary-sized job), picks the most
    * frequent pair on the driver (ONE row — the same legitimate scalar
    * class as k-means centroids), and applies the merge as a pure map.
    *
    * Symbol strings carry a '|' marker BEFORE every symbol ("cat" →
    * "|c|a|t"; '|' can never occur inside a symbol — tokens are
    * [a-z0-9]+), so the merge is a literal string replace of "|l|r" with
    * "|lr" that cannot match across a symbol boundary (the classic
    * substring-merge bug: symbols [ab, a] contain the CHARS "b a"
    * adjacently but never the marker pattern "|b|a"). Leftmost
    * non-overlapping replace = the standard greedy merge order ("aaaa"
    * under (a,a) → "aa aa", not "aa a a"). Ties break (cnt desc, l, r)
    * — deterministic, engine-portable; training stops early if the
    * vocabulary runs out of pairs. */
  def trainMerges(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val base = vocabulary(docs, textCol)
      .where(length(col("word")) >= 2)
      .select(regexp_replace(col("word"), "(.)", "|$1").as("sym"),
        col("freq"))
      .persist()
    try {
      var vocab = base
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= nMerges && !exhausted) {
        val syms = filter(split(col("sym"), "\\|"), x => length(x) > 0)
        val prs = when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => struct(element_at(syms, i).as("l"),
              element_at(syms, i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))
        val top = vocab.select(col("freq"), explode(prs).as("pr"))
          .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, cnt) = (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
          merges += ((step, l, r, cnt))
          vocab = vocab.withColumn("sym",
            replace(col("sym"), lit(s"|$l|$r"), lit(s"|$l$r")))
          step += 1
        }
      }
      import spark.implicits._
      merges.result().toDF("step", "l", "r", "cnt")
    } finally base.unpersist()
  }

  /** BPE APPLICATION — the serving half of [[trainMerges]]: re-tokenize
    * every document under a learned merge table and report per-document
    * (n_words, n_syms), the real token count a budget/packing stage
    * consumes once a tokenizer exists (`TextStats.tokenEstimates`' BPE
    * heuristic, made exact for the learned vocab).
    *
    * `merges` apply IN LEARNED ORDER (BPE application replays training
    * order). Entirely document-local: each word symbol-encodes and folds
    * through the literal marker replaces inside one per-row expression —
    * a pure map stage, no shuffle, no join, no state; the merge table
    * rides into the closure as 2·N string literals (the broadcast-scalar
    * class). Token-less documents are dropped (nothing to count).
    *
    * At 100 TB the alternative — encode the distinct vocabulary once and
    * equi-join words back — trades this map's O(merges) replaces per
    * TOKEN for a corpus-sized shuffle; replaces are cheap enough that
    * the map wins (same reasoning as q95's redaction pass). */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def nSyms(w: org.apache.spark.sql.Column) = {
      val sym0 = regexp_replace(w, "(.)", "|$1")
      val symN = merges.foldLeft(sym0) { case (s, (l, r)) =>
        replace(s, lit(s"|$l|$r"), lit(s"|$l$r"))
      }
      size(split(symN, "\\|")) - 1
    }
    val toks = graft.dedup.Dedup.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_words"),
        aggregate(transform(col("__toks"), w => nSyms(w)),
          lit(0), (acc, x) => acc + x).cast("long").as("n_syms"))
  }
}
