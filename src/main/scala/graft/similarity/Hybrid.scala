package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine independently-produced ranked lists
  * with reciprocal-rank fusion (RRF — Cormack, Clarke & Büttcher, SIGIR
  * 2009; public method). RRF is how production search stacks fuse a
  * lexical ranker (BM25) with a vector ranker (embedding cosine): it
  * consumes only RANKS, so the two scorers need no calibration onto a
  * common scale, it is monotone in each list, and a document absent from
  * one list simply contributes nothing from it.
  *
  * Scale shape: the inputs are top-K ranked lists — BOUNDED artifacts
  * (the scale lives upstream, in the rankers that produced them). Fusion
  * is a union of K-row frames plus one keyed aggregate; at 100 TB the
  * union is per-query-constant-sized and the aggregate shuffles at most
  * lists×K rows. Nothing here touches the corpus. */
object Hybrid {

  /** Fuse `lists` — each (idCol, rankCol) with rank 1-based — into
    * (idCol, rrf_score, n_lists), where
    * rrf_score = Σ_lists 1 / (k0 + rank), rounded to 6 decimals (the
    * engine-wide float-determinism convention: k0 + rank is integer-exact,
    * the division and sum are where ULP noise could enter). `k0 = 60` is
    * the constant from the original paper. `n_lists` is how many lists
    * surfaced the id — the standard fusion-diagnostics column. */
  def rrf(lists: Seq[DataFrame], k0: Int = 60, idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(lists.nonEmpty, "Hybrid.rrf: need at least one ranked list")
    require(k0 >= 1, s"Hybrid.rrf: k0 must be >= 1, got $k0")
    lists
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double")))
          .as("__c")))
      .reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(round(sum(col("__c")), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
  }
}
