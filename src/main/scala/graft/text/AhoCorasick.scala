package graft.text

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Multi-pattern keyword tagging via the Aho–Corasick automaton (Aho &
  * Corasick 1975, public) — the lexicon operator every curation pipeline
  * runs: taxonomy/topic tagging, blocklist screening, PII keyword flags.
  * One automaton finds EVERY occurrence of EVERY pattern (overlapping
  * included — "he" inside "the" is a hit for both) in a single O(n +
  * matches) pass per document, vs k regex scans for a k-word lexicon.
  *
  * Scale story (100 TB): the automaton is a BOUNDED artifact — built once
  * on the driver from the lexicon (KBs–MBs, like the BPE merge table or
  * PQ codebooks), broadcast, and deserialized once per task inside
  * mapPartitions. Tagging is a pure map with NO shuffle; only the
  * optional per-keyword rollup exchanges keyed partials. A per-row regex
  * alternation would rescan the text once per pattern and rebuild the
  * regex per task; the automaton is one linear walk regardless of
  * lexicon size.
  */
object AhoCorasick {

  /** Trie + failure links + merged output lists. Nodes are growable
    * parallel arrays; `out(v)` already includes every pattern ending at
    * `v` through the fail chain (merged at build), so matching never
    * chases fail links to emit — O(text + matches). */
  final class Automaton private[AhoCorasick] (
      val patterns: Array[String],
      next: Array[mutable.HashMap[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** Count of every occurrence of every pattern in `text` (overlapping
      * included), indexed like `patterns`. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var s = state
        var n = next(s).getOrElse(c, -1)
        while (n < 0 && s != 0) {
          s = fail(s)
          n = next(s).getOrElse(c, -1)
        }
        state = if (n < 0) 0 else n
        val hits = out(state)
        var k = 0
        while (k < hits.length) { counts(hits(k)) += 1; k += 1 }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton: trie insert, BFS failure links, output-list
    * merge (out(v) ++= out(fail(v)) in BFS order). */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty lexicon")
    require(patterns.forall(_.nonEmpty), "empty pattern in lexicon")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns in lexicon")
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val ownOut = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var v = 0
      p.foreach { c =>
        v = next(v).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          ownOut += Nil
          next.size - 1
        })
      }
      ownOut(v) = pi :: ownOut(v)
    }
    val n = next.size
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).toArray
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { v =>
      fail(v) = 0
      out(v) = ownOut(v).toArray
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).getOrElse(c, 0) match {
          case `v` => 0 // only possible when f == 0 and next(0)(c) == v
          case w => w
        }
        out(v) = (ownOut(v) ++ out(fail(v))).toArray
        queue += v
      }
    }
    new Automaton(patterns.toArray, next.map(identity).toArray, fail, out)
  }

  /** Tag a corpus: (doc_id, keyword, n) for every pattern with n > 0
    * occurrences (overlapping counted) in the doc's `text`. The automaton
    * broadcasts once; tagging is shuffle-free. */
  def tagCounts(docs: DataFrame, lexicon: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(build(lexicon))
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value // once per task
        it.flatMap { case (docId, text) =>
          val counts = ac.countAll(if (text == null) "" else text)
          counts.indices.iterator
            .filter(counts(_) > 0)
            .map(i => (docId, ac.patterns(i), counts(i)))
        }
      }
      .toDF("doc_id", "keyword", "n")
  }
}
