package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics as iterative join-aggregation — the provenance
  * weighting step of web-corpus curation (crawl pipelines rank hosts by
  * link centrality and feed the score into source mixing/filtering;
  * PageRank is the canonical member, Page et al. 1999 — public method).
  *
  * Everything is node- or edge-keyed Dataframe algebra: per iteration ONE
  * equi-join of the normalized edge table with the current rank vector
  * and ONE keyed aggregate per destination — the sparse-matrix × vector
  * product in relational form. No driver-side state: node count and
  * dangling mass ride as broadcast 1-row frames. At 100 TB-corpus scale
  * (host graph: ~10⁸ nodes, ~10¹⁰ edges) each iteration is a standard
  * keyed shuffle; rank state is node-sized. For many iterations callers
  * should checkpoint the rank frame every few rounds to cut the growing
  * lineage — the fixed small iteration counts used here (3) keep the
  * plan shallow enough that one job executes it whole. */
object Graphs {

  /** Weighted PageRank over `edges` (src, dst, w). Out-probabilities are
    * w normalized by each src's total out-weight; dangling mass (nodes
    * with no out-edges) redistributes uniformly; teleport is the
    * standard (1−damping)/n. Returns (node, r) after `iters` rounds
    * from the uniform start — fixed-iteration (not
    * convergence-tested), so the result is a pure deterministic
    * function of the graph.
    *
    * PERSIST `edges` before calling: nodes, out-weights, normalized
    * edges, and every iteration's dangling/contribution pass all
    * re-derive from it — an unpersisted expensive edge build re-executes
    * ~4× per iteration (q133 measured 3.9 s → 0.6 s at sf0.1 from this
    * alone).
    *
    * The rank frame itself is localCheckpoint'ed every round (the
    * Spectral.topEigen lesson one module over): each iteration references
    * the previous ranks THREE times (dangling mass, contributions, and
    * through the new ranks), so the unbarriered logical plan grows ~3^k
    * and the stage count with it — measured 10.5 s → ~1 s at q133's
    * 25-node graph, where the arithmetic is trivial and ALL the cost was
    * plan/stage explosion. Rank state is node-sized, the right thing to
    * materialize. */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ne = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("outw")).as("p"))
    val srcs = e.select(col("src")).distinct()

    // every frame below descends from `e`, so joins between them are
    // self-joins — explicit aliases keep attribute resolution unambiguous
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to iters) {
      val dang = ranks.alias("rk")
        .join(srcs.alias("sr"), col("rk.node") === col("sr.src"),
          "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dang"))
      val contrib = ne.alias("ne")
        .join(ranks.alias("rk"), col("ne.src") === col("rk.node"))
        .groupBy(col("ne.dst").as("dst"))
        .agg(sum(col("ne.p") * col("rk.r")).as("s"))
      ranks = nodes.alias("nd").crossJoin(broadcast(nn))
        .crossJoin(broadcast(dang))
        .join(contrib.alias("cb"), col("nd.node") === col("cb.dst"),
          "left")
        .select(col("nd.node").as("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) *
            (coalesce(col("s"), lit(0.0)) + col("dang") / col("n")))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
