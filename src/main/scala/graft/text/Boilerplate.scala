package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boilerplate removal / main-content extraction — the step between a raw
  * crawl page and every text-quality gate in the curation layer
  * (readability/trafilatura's core heuristic, reduced to its
  * engine-expressible kernel): navigation chrome, footers, and ad blocks
  * are LINK-DENSE, body prose is not. Per line of markup:
  *
  *   text        = the line with every `<...>` tag stripped
  *   anchor_text = the text inside the line's `<a>...</a>` spans
  *   density     = len(anchor_text) / len(text)
  *
  * and a line survives iff it has any text at all and its density is ≤
  * the threshold. The decision is CONTENT-based, not tag-name-based — a
  * `<p>` that is wholly links (an ad strip) drops, a paragraph with one
  * inline link stays — which is what makes the heuristic robust to the
  * tag soup real crawls contain.
  *
  * Scale shape: one explode to line grain, per-line regex work inside
  * whole-stage codegen, one keyed re-aggregation back to documents —
  * embarrassingly parallel, no shuffle beyond the final groupBy on the
  * already-partitioned doc key. Every regex here is ANSI-portable (the
  * DuckDB oracle replays them verbatim), so the gate checks decisions,
  * not just plumbing.
  */
object Boilerplate {

  /** Tag-stripped text of a markup line. */
  def stripTags(line: Column): Column =
    regexp_replace(line, "<[^>]*>", "")

  /** Concatenated tag-stripped anchor text of a markup line. The span
    * match is NON-GREEDY across nested markup (`<a><b>Buy</b></a>`
    * counts "Buy", not zero chars — real-crawl anchors wrap images,
    * bolds, spans), then tags inside the captured span are stripped so
    * only rendered characters enter the density ratio. Java regex and
    * DuckDB's RE2 agree on `(.*?)` laziness, so the oracle replays it
    * verbatim. Known residual: a nested `<a>` inside an `<a>` ends the
    * span at the FIRST `</a>` — invalid HTML that no linear regex pairs
    * correctly; the unmatched tail still strips out of `text`, so the
    * density only under-counts, never over-counts, on such soup. */
  def anchorText(line: Column): Column =
    regexp_replace(
      array_join(
        regexp_extract_all(line, lit("<a[^>]*>(.*?)</a>"), lit(1)), ""),
      "<[^>]*>", "")

  /** (doc_id, main_text, n_kept, n_dropped) from (docCol, pageCol) pages:
    * lines split on `\n`, kept iff nonempty text with link density ≤
    * `maxDensity`, re-joined with `\n` in original order. */
  def extractMain(pages: DataFrame, docCol: String = "doc_id",
      pageCol: String = "page", maxDensity: Double = 0.5): DataFrame = {
    val lines = pages
      .select(col(docCol), posexplode(split(col(pageCol), "\n"))
        .as(Seq("line_no", "line")))
      .withColumn("txt", stripTags(col("line")))
      .withColumn("alen", length(anchorText(col("line"))))
      .withColumn("keep",
        length(col("txt")) > 0 &&
          col("alen") <= lit(maxDensity) * length(col("txt")))
    lines
      .groupBy(col(docCol))
      .agg(
        array_join(transform(sort_array(collect_list(
            when(col("keep"), struct(col("line_no"), col("txt"))))),
          s => s.getField("txt")), "\n").as("main_text"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum((!col("keep")).cast("long")).as("n_dropped"))
  }
}
