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
    * Every symbol is WRAPPED in '|' markers ("cat" → "|c||a||t|"; '|'
    * can never occur inside a symbol — tokens are [a-z0-9]+), so the
    * merge is a literal string replace of "|l||r|" with "|lr|" that is
    * anchored on BOTH ends of both symbols: it cannot match across a
    * symbol boundary (symbols [ab, a] contain the CHARS "b a" adjacently
    * but never the marker pattern "|b||a|") and cannot match r as a
    * PREFIX of a longer symbol (symbols [a, bc] do not match "|a||b|" —
    * the one-sided "|a|b" marker form would, corrupting [a,bc] → [abc]).
    * Adjacent occurrences share no characters under this encoding, so
    * leftmost non-overlapping replace = the standard greedy merge order
    * ("aaaa" under (a,a) → "aa aa", not "aa a a"). Ties break
    * (cnt desc, l, r) — deterministic, engine-portable; training stops
    * early if the vocabulary runs out of pairs.
    *
    * SCALE BOUND: each merge step is one distributed job plus a 1-row
    * collect — fine for the oracle-unrolled demo regime (nMerges ≲ 10),
    * a non-starter for a real 32k-merge tokenizer (32k job launches).
    * [[trainMergesLocal]] is the production path: ONE distributed
    * vocabulary aggregation, then the greedy loop driver-locally over
    * the bounded vocabulary artifact — identical output by construction
    * (BpeSpec pins equality). */
  def trainMerges(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val base = vocabulary(docs, textCol)
      .where(length(col("word")) >= 2)
      .select(regexp_replace(col("word"), "(.)", "|$1|").as("sym"),
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
            replace(col("sym"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
          step += 1
        }
      }
      import spark.implicits._
      merges.result().toDF("step", "l", "r", "cnt")
    } finally base.unpersist()
  }

  /** The PRODUCTION BPE trainer: same greedy algorithm, same output, but
    * the merge loop runs DRIVER-LOCALLY over the collected vocabulary —
    * the standard architecture (HF tokenizers / sentencepiece): the
    * distinct word-count vocabulary is a BOUNDED artifact (tens of
    * millions of words for a 100 TB corpus — the [[vocabulary]]
    * aggregation partial-aggregates map-side, so the corpus-sized stage
    * ships ~one row per distinct word per partition), while the merge
    * loop is vocabulary-sized work × nMerges that must not pay a Spark
    * job launch per step. ONE distributed aggregation + ONE collect
    * (guarded by `maxVocab` — fail loudly rather than silently OOM the
    * driver), then 32k merges run in milliseconds-per-step locally; the
    * learned table broadcasts back into [[encode]]'s pure-map apply.
    *
    * Algorithm state: per-word symbol arrays, a pair→count map, a
    * pair→occurring-words index, and a (cnt desc, l, r) ordered set for
    * O(log n) argmax — each step touches only the words containing the
    * winning pair (remove their pair contributions, merge leftmost
    * non-overlapping, re-add). Counting semantics are [[trainMerges]]'s
    * exactly: adjacent pairs count with overlap ("aaa" contributes (a,a)
    * twice), merges apply leftmost non-overlapping, ties break
    * (cnt desc, l, r) — BpeSpec pins table equality on a real corpus and
    * runs this at 1000+ merges. */
  def trainMergesLocal(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 3, maxVocab: Int = 50000000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val rows = vocabulary(docs, textCol)
      .where(length(col("word")) >= 2)
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab; raise the cap only with " +
        "driver memory to hold it — this collect is the one bounded " +
        "driver artifact of BPE training")
    val words = rows.map(r => r.getString(0).toCharArray.map(_.toString))
    val freqs = rows.map(_.getLong(1))

    // pair → corpus count, pair → set of word indices containing it, and
    // the selection order (cnt desc, then l, then r — trainMerges' ties)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occ = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering[Long].reverse, Ordering[String], Ordering[String])
    val queue = scala.collection.mutable.TreeSet.empty[(Long, String, String)]

    def addWord(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val before = counts.getOrElse(p, 0L)
        val after = before + sign * freqs(wi)
        if (before > 0) queue.remove((before, p._1, p._2))
        if (after > 0) {
          counts(p) = after
          queue.add((after, p._1, p._2))
        } else counts.remove(p)
        if (sign > 0) occ.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty[Int]) += wi
        i += 1
      }
      if (sign < 0) {
        // drop stale occurrence entries lazily: cheaper to re-check at
        // merge time than to maintain exact multiplicity here
      }
    }
    words.indices.foreach(addWord(_, 1L))

    def mergeWord(w: Array[String], l: String, r: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i < w.length - 1 && w(i) == l && w(i + 1) == r) {
          out += l + r
          i += 2 // leftmost non-overlapping: the merged symbol is consumed
        } else {
          out += w(i)
          i += 1
        }
      }
      out.toArray
    }

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    while (step <= nMerges && queue.nonEmpty) {
      val (cnt, l, r) = queue.head
      merges += ((step, l, r, cnt))
      val affected = occ.getOrElse((l, r), scala.collection.mutable.Set.empty)
        .toArray.sorted
      affected.foreach { wi =>
        val w = words(wi)
        // stale index entries (pair no longer present) are skipped here
        var has = false
        var i = 0
        while (!has && i < w.length - 1) {
          has = w(i) == l && w(i + 1) == r; i += 1
        }
        if (has) {
          addWord(wi, -1L)
          words(wi) = mergeWord(w, l, r)
          addWord(wi, 1L)
        }
      }
      occ.remove((l, r))
      step += 1
    }
    import spark.implicits._
    merges.result().toDF("step", "l", "r", "cnt")
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
    def nSymsFold(w: org.apache.spark.sql.Column) = {
      val sym0 = regexp_replace(w, "(.)", "|$1|")
      val symN = merges.foldLeft(sym0) { case (s, (l, r)) =>
        replace(s, lit(s"|$l||$r|"), lit(s"|$l$r|"))
      }
      size(split(symN, "\\|\\|"))
    }
    // Two evaluators with IDENTICAL semantics (BpeSpec pins equality):
    // the replace-fold stays whole-stage-codegen'd but nests one replace
    // per merge — a 32k-merge table would build a 32k-deep expression
    // tree (StackOverflow in the Column converter long before execution,
    // measured at 1000). Past the depth bound, [[BpeSymCount]] evaluates
    // the same in-order leftmost-non-overlapping merges natively per
    // word: one O(1) adjacency-set probe per merge row, a real pass only
    // for merges actually present (≤ len−1 of them per word).
    def nSyms(w: org.apache.spark.sql.Column) =
      if (merges.size <= 64) nSymsFold(w)
      else BpeSymCount(merges)(w)
    val toks = graft.dedup.Dedup.tokens(col(textCol))
    docs
      .withColumn("__toks", toks)
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_words"),
        aggregate(transform(col("__toks"), w => nSyms(w)),
          lit(0), (acc, x) => acc + x).cast("long").as("n_syms"))
  }

  /** Reference evaluator shared by [[BpeSymCount]] and the specs: apply
    * `merges` IN LEARNED ORDER, each as one leftmost non-overlapping
    * pass over the symbol array (exactly the wrapped-marker replace
    * fold, without the string encoding), and return the surviving
    * symbol count. The adjacency set makes skipping absent merges O(1),
    * so a 32k-row table costs 32k probes + a pass per APPLIED merge. */
  def symbolCount(word: String, merges: Seq[(String, String)]): Int = {
    if (word.isEmpty) return 0
    var syms: Array[String] = word.toCharArray.map(_.toString)
    val present = scala.collection.mutable.HashSet.empty[(String, String)]
    def rebuild(): Unit = {
      present.clear()
      var i = 0
      while (i < syms.length - 1) {
        present += ((syms(i), syms(i + 1))); i += 1
      }
    }
    rebuild()
    merges.foreach { case (l, r) =>
      if (present.contains((l, r))) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else {
            out += syms(i); i += 1
          }
        }
        syms = out.toArray
        rebuild()
      }
    }
    syms.length
  }
}
