package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Similarity search over embedding columns (`array<double>`), as a
  * library: the exact brute-force baseline and the two scale paths (IVF
  * cell pruning, random-hyperplane cosine LSH). Ranking keys are
  * `round(cos, 6)` with id tiebreaks so top-k selection is deterministic
  * across engines (the driver queries q24/q25/q31/q37 pin semantics
  * against DuckDB's `list_cosine_similarity`).
  *
  * Scale contract: brute force broadcasts only the QUERY side (small);
  * IVF/LSH turn the search into an equi-join on the cell/bucket — the
  * shuffle key — so cost tracks bucket occupancy, not the pair space. */
object Similarity {

  /** Top-k nearest candidates per query by cosine, exact. `queries` must
    * be broadcast-small; `candidates` is unbounded. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      queryId: String = "query_id", candId: String = "vec_id",
      queryVec: String = "qe", candVec: String = "e"): DataFrame = {
    val cos = CosineSimilarity(col(queryVec), col(candVec))
    candidates.crossJoin(broadcast(queries))
      .select(col(queryId), col(candId), round(cos, 6).as("cos_sim"))
      .withColumn("rk", row_number().over(Window.partitionBy(col(queryId))
        .orderBy(col("cos_sim").desc, col(candId))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Top-k neighbors per vector, searched only within the vector's coarse
    * cell (`labelCol`) — IVF-style pruning; the cell is the shuffle key.
    *
    * NOTE: this is the cell-pruning MECHANISM on a GIVEN partitioning. Its
    * quality is exactly the quality of that partitioning: on this repo's
    * testdata the planted `label` yields recall@3 ≈ random (AnnQualitySpec),
    * so the recommended production path is [[trainCells]] +
    * [[assignCells]] (+ [[ivfMultiProbeTopK]] for tunable recall), which
    * trains the cells from the data itself. */
  def ivfTopK(emb: DataFrame, k: Int, idCol: String = "vec_id",
      labelCol: String = "label", vecCol: String = "e"): DataFrame = {
    val a = emb.select(col(idCol), col(labelCol), col(vecCol))
    val b = emb.select(col(idCol).as("neighbor_id"), col(labelCol),
      col(vecCol).as("__ne"))
    val cos = CosineSimilarity(col(vecCol), col("__ne"))
    a.join(b, labelCol)
      .where(col(idCol) =!= col("neighbor_id"))
      .select(col(idCol), col(labelCol), round(cos, 6).as("cos_sim"),
        col("neighbor_id"))
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Sign-bit bucket of `planes` deterministic pseudo-random hyperplanes
    * (integer weights, engine-portable) — the cosine-LSH shuffle key.
    * Each sign projection is the native codegen'd
    * [[graft.functions.DotProduct]] against a literal plane (the
    * interpreted `aggregate(zip_with(...))` form paid a lambda frame per
    * element × planes); summation order is unchanged, so the bits — and
    * the DuckDB oracle — are identical. */
  def hyperplaneBucket(spark: org.apache.spark.sql.SparkSession,
      vecCol: Column, dim: Int, planes: Int): Column = {
    def weight(p: Int, j: Int): Long =
      ((p.toLong * dim + j) * 2654435761L) % 97 - 48
    val bits = (0 until planes).map { p =>
      val hp = array((0 until dim).map(j => lit(weight(p, j).toDouble)): _*)
      when(graft.functions.DotProduct(vecCol, hp) >= 0,
        lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Trained coarse-quantizer cells: spherical k-means over the embedding
    * column, entirely in-engine. Seeds are the `k` vectors ranked first by
    * `(md5(id), id)` (deterministic, engine-portable pseudo-random spread);
    * each Lloyd iteration assigns every vector to its max-cosine centroid
    * (round-6 with min-cell tiebreak — the same determinism contract as the
    * top-k queries) and recomputes centroids as the per-dimension member
    * mean, rounded to 6 decimals so the next iteration's inputs are
    * bit-identical across engines regardless of summation order.
    *
    * Scale shape: assignment is a PURE MAP stage (centroids travel as a
    * k×dim literal, no join); the update is one partial-aggregated shuffle
    * of k×dim averages. Only k×dim doubles ever move through the driver
    * per iteration — the legitimate "small side" (same class as the 6-row
    * threshold tables). Cosine is scale-invariant in the centroid, so the
    * unnormalized mean is a faithful spherical-k-means step.
    *
    * Returns centroids ordered by cell id; cells emptied during training
    * drop out (consistent across engines — GROUP BY keeps only members). */
  def trainCells(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "e",
      sampleFraction: Double = 1.0): Array[(Int, Array[Double])] = {
    // The 100 TB variant: train the quantizer on a deterministic id-stable
    // sample (same digest-priority scheme as graft.analytics.Sampling), then
    // assign the FULL table with the same shuffle-free map stage. k-means
    // centroids are distributional estimates, so a uniform sample preserves
    // them; AnnQualitySpec pins sample-trained recall within 0.05 of
    // full-data recall.
    val train =
      if (sampleFraction >= 1.0) emb
      else graft.analytics.Sampling.bernoulli(emb, idCol, sampleFraction)
    val init = train
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
    var cents = init.zipWithIndex.map { case (r, i) =>
      i -> r.getSeq[Double](0).toArray
    }
    val dim = cents.head._2.length
    for (_ <- 1 to iters) {
      val assigned = assignCells(train, cents, idCol, vecCol)
      val centCols = (0 until dim).map(i =>
        round(avg(col(vecCol)(i)), 6).as(s"__c$i"))
      cents = assigned
        .groupBy(col("cell"))
        .agg(centCols.head, centCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i =>
          r.getDouble(r.fieldIndex(s"__c$i"))).toArray)
        .sortBy(_._1)
    }
    cents
  }

  /** Every row of `emb` plus its quantizer cell (`cell`) and the round-6
    * cosine to that cell's centroid (`cell_sim`): argmax over the given
    * centroids, min-cell tiebreak. Centroids are inlined as a literal
    * array-of-structs, so this is a shuffle-free map stage at any scale. */
  /** `(negcos, cell)` structs for every centroid, cosine-ranked ascending
    * by `array_sort`'s struct ordering — i.e. round-6 cosine DESC with
    * min-cell tiebreak, the engine-portable determinism contract.
    * `+ 0.0` normalizes IEEE -0.0 to +0.0: Spark's struct ordering ranks
    * -0.0 below +0.0 while SQL engines compare them equal, so a cosine
    * that rounds to zero must not leak a sign bit into the ordering. */
  private def rankedCells(spark: org.apache.spark.sql.SparkSession,
      vecCol: String, cents: Array[(Int, Array[Double])]): Column = {
    val centsLit = array(cents.map { case (c, v) =>
      struct(lit(c).as("cell"),
        array(v.toIndexedSeq.map(lit): _*).as("centroid"))
    }.toIndexedSeq: _*)
    array_sort(transform(centsLit, c =>
      struct(
        (-round(CosineSimilarity(col(vecCol), c.getField("centroid")),
          6) + 0.0).as("negcos"),
        c.getField("cell").as("cell"))))
  }

  def assignCells(emb: DataFrame, cents: Array[(Int, Array[Double])],
      idCol: String = "vec_id", vecCol: String = "e"): DataFrame = {
    // argmax cos (tiebreak min cell) == first element of the ranked array.
    val best = rankedCells(emb.sparkSession, vecCol, cents).getItem(0)
    emb.select(emb.columns.toIndexedSeq.map(col) ++ Seq(
      best.getField("cell").as("cell"),
      (-best.getField("negcos") + 0.0).as("cell_sim")): _*)
  }

  /** One row per (vector, probed cell): the vector's `probes` nearest
    * quantizer cells by round-6 cosine (min-cell tiebreak), ranked 1..p in
    * `probe_rank`. Like [[assignCells]] this is a shuffle-free map stage —
    * the centroids travel as a literal; the output is `probes`× the input
    * rows, which downstream joins key by `cell`. */
  def probeCells(emb: DataFrame, cents: Array[(Int, Array[Double])],
      probes: Int, idCol: String = "vec_id", vecCol: String = "e")
      : DataFrame = {
    val ranked = rankedCells(emb.sparkSession, vecCol, cents)
    emb.select(emb.columns.toIndexedSeq.map(col) :+
        posexplode(slice(ranked, 1, probes)): _*)
      .select(emb.columns.toIndexedSeq.map(col) ++ Seq(
        (col("pos") + 1).as("probe_rank"),
        col("col").getField("cell").as("cell"),
        (-col("col").getField("negcos") + 0.0).as("cell_sim")): _*)
  }

  /** Multi-probe trained-IVF search: every vector probes its `probes`
    * nearest cells and is searched against the candidates assigned to
    * those cells — the standard IVF recall knob (recall rises with p,
    * cost is ~p× the single-probe join). `cell` is the shuffle key, so
    * cost tracks probed-cell occupancy, not the pair space. `probes = 1`
    * degenerates to [[ivfTopK]] over [[assignCells]].
    *
    * `assignProbes` is the CANDIDATE-side coverage knob: with the default
    * 1 each candidate lives in exactly one cell (per-query candidate
    * lists disjoint, no dedup needed); at `assignProbes = a > 1` every
    * candidate is indexed under its `a` nearest cells (the index grows
    * a×, and a query finds a neighbor when the neighbor's a cells
    * intersect the query's p cells — recall rises on both knobs). A
    * candidate can then reach one query through several shared cells, so
    * the pair stream is DISTINCT-ed before ranking — same shuffle key,
    * one extra exchange on the deduped pairs.
    *
    * This is the RECOMMENDED similarity-search configuration (see
    * AnnQualitySpec/PLANS.md: recall@3 0.352 @p=1 → ≥0.6 @p=3 on the
    * test corpus, vs 0.088 for the planted label; p=4 with
    * assignProbes=2 clears 0.85 at sf0.1). */
  /** DELETION (takedown/GDPR) for the IVF index WITHOUT retraining or
    * rebuilding — the r14 verdict's gap in the add-only ANN maintenance
    * (q203/q205 only ever assign NEW vectors): the standing posting
    * table keeps every vector; a broadcast TOMBSTONE anti-join drops
    * deleted vectors from the candidate side at serving time, and
    * deleted ids are not served as queries. The quantizer is frozen
    * (deletion must not shift cells under live queries) and cell
    * assignment is per-vector, so tombstone-filtering the postings
    * commutes with assignment: results are row-equal to an index REBUILT
    * over the retained corpus under the same centroids —
    * IvfRetractSpec pins that equivalence (tombstone serving ==
    * compacted postings == retained rebuild), q214 gates it against the
    * full retrain-and-filter DuckDB oracle. Compaction (physically
    * dropping tombstoned posting rows, [[compactPostings]]) is the
    * amortized cleanup, exactly like the CC maintainer's base rewrite.
    *
    * `postings` is [[assignCells]]' output over the FULL corpus (the
    * standing index; pass `probeCells(emb, cents, a)` output for an
    * assignProbes-widened index — extra columns ride along unread, but
    * then ALSO pass `assignProbes = a`: the widened table holds `a` rows
    * per vector, so the query side must collapse to one row per vector
    * and the pair stream must dedup before ranking, exactly as
    * [[ivfMultiProbeTopK]] does — without it a neighbor reachable
    * through several shared cells occupies several ranks and crowds real
    * neighbors out of the top k); `tombstones` the removed ids.
    * Tombstone sets are tiny relative to the corpus, so both anti-joins
    * broadcast — no shuffle is added to the a=1 serve path. */
  def ivfTombstoneTopK(postings: DataFrame,
      cents: Array[(Int, Array[Double])], tombstones: DataFrame, k: Int,
      probes: Int, idCol: String = "vec_id", vecCol: String = "e",
      assignProbes: Int = 1): DataFrame = {
    val tomb = broadcast(tombstones.select(col(idCol)).distinct())
    val cand = compactPostings(postings, tomb, idCol)
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col(vecCol).as("__ne"))
    val queries0 = postings.select(col(idCol), col(vecCol))
    val queries = (if (assignProbes <= 1) queries0 else queries0.distinct())
      .join(tomb, Seq(idCol), "left_anti")
    val probed = probeCells(queries, cents, probes, idCol, vecCol)
      .select(col(idCol), col("cell"), col(vecCol))
    val cos = CosineSimilarity(col(vecCol), col("__ne"))
    val pairs = probed.join(cand, "cell")
      .where(col(idCol) =!= col("neighbor_id"))
      .select(col(idCol), round(cos, 6).as("cos_sim"), col("neighbor_id"))
    val deduped = if (assignProbes <= 1) pairs else pairs.distinct()
    deduped
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Physically drop tombstoned rows from the posting table — the
    * amortized compaction behind [[ivfTombstoneTopK]]'s serve-time
    * filter (run it when the tombstone set grows past a bound; serving
    * through the filter and serving the compacted table are the same
    * rows by construction — the filter IS this anti-join). */
  def compactPostings(postings: DataFrame, tombstones: DataFrame,
      idCol: String = "vec_id"): DataFrame =
    postings.join(broadcast(tombstones.select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")

  def ivfMultiProbeTopK(emb: DataFrame, cents: Array[(Int, Array[Double])],
      k: Int, probes: Int, idCol: String = "vec_id", vecCol: String = "e",
      assignProbes: Int = 1): DataFrame = {
    val cand = (
      if (assignProbes <= 1) assignCells(emb, cents, idCol, vecCol)
      else probeCells(emb, cents, assignProbes, idCol, vecCol))
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col(vecCol).as("__ne"))
    val probed = probeCells(emb, cents, probes, idCol, vecCol)
      .select(col(idCol), col("cell"), col(vecCol))
    val cos = CosineSimilarity(col(vecCol), col("__ne"))
    val pairs = probed.join(cand, "cell")
      .where(col(idCol) =!= col("neighbor_id"))
      .select(col(idCol), round(cos, 6).as("cos_sim"), col("neighbor_id"))
    val deduped = if (assignProbes <= 1) pairs else pairs.distinct()
    deduped
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Two-stage IVF-flat refine: the probed-cell candidate stream is scored
    * first against an INT8 scalar-quantized candidate index (asymmetric:
    * exact query × quantized candidate — the ADC trick), a per-query
    * `shortlist` survives, and only the shortlist is re-ranked with the
    * exact round-6 cosine. Same result contract as [[ivfMultiProbeTopK]]
    * (AnnQualitySpec pins the agreement), different cost shape for 100 TB:
    * the index that flows through the big `cell` join carries 1 byte/dim
    * + two doubles instead of 8 bytes/dim, and full vectors are gathered
    * only for shortlist×queries rows (two id-keyed joins over the
    * shortlist — rows ~ s·|Q|, tiny next to the candidate stream).
    *
    * `shortlist` tunes the approximation risk: a true top-k neighbor is
    * lost only if int8 rounding pushes it below rank `shortlist` in its
    * query's candidate list; s ≈ 4–8× k makes that a tail event (measured
    * zero loss on the test corpus at s = 4k). */
  def ivfRefineTopK(emb: DataFrame, cents: Array[(Int, Array[Double])],
      k: Int, probes: Int, shortlist: Int, idCol: String = "vec_id",
      vecCol: String = "e", assignProbes: Int = 1): DataFrame = {
    val sq = transform(col(vecCol), x => round(x / col("__qs")).cast("tinyint"))
    def quantized(df: DataFrame): DataFrame = df
      .withColumn("__qs",
        greatest(array_max(col(vecCol)), -array_min(col(vecCol)), lit(1e-300))
          / 127.0)
      .withColumn("__sq", sq)
      .withColumn("__nrm",
        sqrt(graft.functions.DotProduct(col(vecCol), col(vecCol))))
    val cand = quantized(
      if (assignProbes <= 1) assignCells(emb, cents, idCol, vecCol)
      else probeCells(emb, cents, assignProbes, idCol, vecCol))
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col("__sq").as("__csq"), col("__qs").as("__cqs"),
        col("__nrm").as("__cnrm"))
    val probed = probeCells(emb, cents, probes, idCol, vecCol)
      .withColumn("__nrm",
        sqrt(graft.functions.DotProduct(col(vecCol), col(vecCol))))
      .select(col(idCol), col("cell"), col(vecCol), col("__nrm"))
    // stage 1: asymmetric quantized score — exact query vector against the
    // dequantized candidate; one native dot product per pair
    val approx = graft.functions.DotProduct(
      col(vecCol), col("__csq").cast("array<double>")) * col("__cqs") /
      (col("__nrm") * col("__cnrm"))
    val pairs = probed.join(cand, "cell")
      .where(col(idCol) =!= col("neighbor_id"))
      .select(col(idCol), col("neighbor_id"), round(approx, 9).as("__a"))
    val deduped = if (assignProbes <= 1) pairs else pairs.distinct()
    val short = deduped
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("__a").desc, col("neighbor_id"))))
      .where(col("rk") <= shortlist)
      .select(col(idCol), col("neighbor_id"))
    // stage 2: gather exact vectors for the shortlist only, re-rank
    val cos = CosineSimilarity(col("__qe"), col("__ne"))
    short
      .join(emb.select(col(idCol), col(vecCol).as("__qe")), idCol)
      .join(emb.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__ne")), "neighbor_id")
      .select(col(idCol), round(cos, 6).as("cos_sim"), col("neighbor_id"))
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Banded hyperplane buckets: `bands` keys per vector, band b = the
    * sign bits of planes [b·r, b·r+r) prefixed with the band index — the
    * cosine-LSH analog of MinHash banding (a pair is a candidate when ALL
    * r bits of SOME band agree; r tunes per-band selectivity, `bands`
    * tunes recall). The full bit string is computed ONCE per vector
    * behind a repartition barrier (CollapseProject would otherwise
    * re-inline the plane aggregates into every band's substring). */
  def hyperplaneBands(emb: DataFrame, dim: Int, bands: Int,
      planesPerBand: Int, idCol: String = "vec_id", vecCol: String = "e")
      : DataFrame = {
    val r = planesPerBand
    emb
      .select(col(idCol), col(vecCol),
        hyperplaneBucket(emb.sparkSession, col(vecCol), dim, bands * r)
          .as("__bits"))
      .repartition(col(idCol)) // barrier: bits once, not once per band
      .select(col(idCol), col(vecCol),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          concat(b.cast("string"), lit(":"),
            col("__bits").substr(b * r + 1, lit(r))))).as("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: banded-LSH candidates
    * (equi-join on the bucket — the shuffle key) verified with the EXACT
    * round-6 cosine at `threshold`. Precision is exact by construction
    * (every returned pair passed the true cosine test); recall is the LSH
    * banding's and is measured, not assumed (EmbeddingNearDupSpec). The
    * scale shape is identical to the MinHash path (q28): document-local
    * sketch, fixed fan-out equi-join, candidate-driven verify — never the
    * all-pairs cross join. */
  def cosineNearDupPairs(emb: DataFrame, dim: Int, threshold: Double,
      bands: Int = 6, planesPerBand: Int = 3, idCol: String = "vec_id",
      vecCol: String = "e"): DataFrame = {
    val banded = hyperplaneBands(emb, dim, bands, planesPerBand, idCol, vecCol)
      .select(col(idCol), col("bucket"))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val cos = CosineSimilarity(col("__ae"), col("__be"))
    cands
      .join(emb.select(col(idCol).as("id_a"), col(vecCol).as("__ae")), "id_a")
      .join(emb.select(col(idCol).as("id_b"), col(vecCol).as("__be")), "id_b")
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Global top-k most-similar pairs, exact — `orderBy().limit()` plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge), never a
    * single-partition window. */
  def topKPairs(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "e"): DataFrame = {
    val cos = CosineSimilarity(col("__ae"), col("__be"))
    emb.select(col(idCol).as("id_a"), col(vecCol).as("__ae"))
      .join(emb.select(col(idCol).as("id_b"), col(vecCol).as("__be")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication via quantizer cells — a vector is a *semantic
    * duplicate* when some SAME-CELL member with a smaller id has round-6
    * cosine ≥ `threshold`; the minimum such id is its representative
    * (`dup_of`). Pruning the `is_dup` rows keeps exactly one member per
    * within-cell duplicate group (the min id — deterministic across
    * engines and retries).
    *
    * Input is [[assignCells]] output. The pairwise cosine runs ONLY
    * within cells — the cell is the shuffle key, cost tracks
    * Σ cell_size², never the corpus pair space; cross-cell duplicates are
    * the method's documented recall tradeoff (raise k and the cells
    * shrink; SemDeDup's own evaluation accepts it). */
  def semanticDupes(assigned: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "e"): DataFrame = {
    val cos = round(CosineSimilarity(col(vecCol), col("__be")), 6)
    val dupOf = assigned.select(col(idCol), col("cell"), col(vecCol))
      .join(assigned.select(col(idCol).as("__bid"), col("cell"),
        col(vecCol).as("__be")), "cell")
      .where(col("__bid") < col(idCol) && cos >= threshold)
      .groupBy(col(idCol), col("cell"))
      .agg(min(col("__bid")).as("dup_of"))
    assigned.select(col(idCol), col("cell"))
      .join(dupOf.select(col(idCol), col("dup_of")), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
  }

  /** SemDeDup with MULTI-PROBE assignment — the cross-cell recall
    * recovery: the pair stage sees every vector under its `probes`
    * nearest cells ([[probeCells]]), so a duplicate pair split by a
    * quantizer boundary is still found whenever the two vectors' probed
    * cell sets overlap. Cost is bounded by probes² × Σ cell² (each cell's
    * pair stage sees ≤ probes× its single-assignment occupancy); the cell
    * stays the shuffle key. The reported `cell` is the primary (nearest)
    * cell, identical to [[assignCells]]; `dup_of` = the min smaller-id
    * match across ALL shared probed cells (groupBy the vector, not the
    * (vector, cell) pair, so overlapping cells never duplicate rows).
    * `probes = 1` degenerates to [[semanticDupes]] over [[assignCells]].
    * SemDeDupSpec measures the recall delta vs the single-cell baseline
    * against the brute-force pair truth. */
  def semanticDupesMultiProbe(emb: DataFrame,
      cents: Array[(Int, Array[Double])], threshold: Double,
      probes: Int = 2, idCol: String = "vec_id", vecCol: String = "e")
      : DataFrame = {
    val probed = probeCells(emb, cents, probes, idCol, vecCol)
    val cos = round(CosineSimilarity(col(vecCol), col("__be")), 6)
    val dupOf = probed.select(col(idCol), col("cell"), col(vecCol))
      .join(probed.select(col(idCol).as("__bid"), col("cell"),
        col(vecCol).as("__be")), "cell")
      .where(col("__bid") < col(idCol) && cos >= threshold)
      .groupBy(col(idCol))
      .agg(min(col("__bid")).as("dup_of"))
    probed.where(col("probe_rank") === 1).select(col(idCol), col("cell"))
      .join(dupOf, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dup_of"),
        col("dup_of").isNotNull.as("is_dup"))
  }

  // ------------------------------------------------- product quantization

  /** The `m` contiguous subvectors of `vec` (`array<array<double>>`). */
  private def subVectors(vec: Column, m: Int, sd: Int): Column =
    array((0 until m).map(s => slice(vec, s * sd + 1, sd)): _*)

  /** `vec` reindexed by `perm` (0-based input-dim indices in output
    * order) — a pure projection, codegen'd, shuffle-free. A permutation
    * is orthonormal, so cosine/L2 between permuted vectors equal the
    * originals; only the SUBSPACE SPLIT downstream sees the difference. */
  def permuteVec(vec: Column, perm: Seq[Int]): Column =
    array(perm.map(i => element_at(vec, i + 1)): _*)

  /** OPQ-lite (the eigenvalue-allocation half of Ge et al. 2014, without
    * the learned rotation): a deterministic coordinate permutation that
    * balances per-dimension VARIANCE across the `m` PQ subspaces, so no
    * subspace's codebook is starved while another is overloaded. One
    * aggregation computes the round-6 per-dim variance (the round-6
    * contract makes the permutation itself engine-reproducible — a DuckDB
    * oracle derives the identical ordering); dims ranked by (variance
    * DESC, dim ASC) are then dealt SNAKE-wise (forward, reverse,
    * forward, …) into the m buckets — boustrophedon dealing is a pure
    * function of rank, so it is replayable in SQL, unlike greedy
    * min-load packing. Returns the permutation as 0-based input dims in
    * output order (bucket 0's dims in rank order, then bucket 1's, …) —
    * feed to [[permuteVec]] on BOTH the training and the encode/query
    * side. On an isotropic corpus (flat per-dim variance) this is a
    * near-identity reshuffle and buys nothing — measured honestly in
    * PLANS.md; its value appears when embeddings carry structured
    * variance (PCA'd features, concatenated modalities). */
  def varianceBalancedPerm(emb: DataFrame, m: Int, dim: Int,
      vecCol: String = "e"): Array[Int] = {
    val aggs = (0 until dim).map { i =>
      val x = col(vecCol)(i)
      round(avg(x * x) - avg(x) * avg(x), 6).as(s"__v$i")
    }
    val row = emb.agg(aggs.head, aggs.tail: _*).head()
    val ranked = (0 until dim).map(i => (i, row.getDouble(i)))
      .sortBy { case (i, v) => (-v, i) }
    val buckets = Array.fill(m)(Vector.empty[Int])
    ranked.zipWithIndex.foreach { case ((i, _), r) =>
      val b = if ((r / m) % 2 == 0) r % m else m - 1 - (r % m)
      buckets(b) = buckets(b) :+ i
    }
    buckets.flatten.toArray
  }

  /** Nested codebook literal: element s+1 is subspace s's code-ordered
    * array of (code, centroid) structs. */
  private def pqCentsLit(cents: Array[(Int, Int, Array[Double])],
      m: Int): Column =
    array((0 until m).map { s =>
      array(cents.filter(_._1 == s).sortBy(_._2).map { case (_, c, v) =>
        struct(lit(c).as("code"),
          array(v.toIndexedSeq.map(lit): _*).as("centroid"))
      }.toIndexedSeq: _*)
    }: _*)

  /** Round-6 squared L2 as a SEQUENTIAL fold over dimensions — the
    * summation-order half of the cross-engine determinism contract (the
    * oracle's `list_aggregate(list_transform(...), 'sum')` folds the same
    * way, so both engines see bit-identical distances pre-round). */
  private def l2sq(x: Column, c: Column): Column =
    round(aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** (dist, code) structs for one subspace's codebook, ascending — argmin
    * round-6 L2 with min-code tiebreak, [[rankedCells]]'s contract in the
    * L2 metric (subvectors are not unit-norm, so cosine is the wrong
    * geometry here). */
  private def rankedCodes(centsLit: Column, sub: Column, sv: Column): Column =
    array_sort(transform(element_at(centsLit, sub + 1), c =>
      struct(l2sq(sv, c.getField("centroid")).as("dist"),
        c.getField("code").as("code"))))

  /** The argmin code only — `array_min` over the same (dist, code) structs
    * (lexicographic struct ordering ⇒ identical round-6-L2-then-min-code
    * contract as `rankedCodes(...).getItem(0)`), but O(ksub) instead of a
    * full O(ksub log ksub) sort. Every PQ assignment/encode site needs
    * just the argmin, and at the 1-byte-code operating point (ksub = 256,
    * q118) the sort was the dominant per-row cost. */
  private def bestCode(centsLit: Column, sub: Column, sv: Column): Column =
    array_min(transform(element_at(centsLit, sub + 1), c =>
      struct(l2sq(sv, c.getField("centroid")).as("dist"),
        c.getField("code").as("code")))).getField("code")

  /** Product-quantization codebooks, trained entirely in-engine (PQ,
    * Jégou et al. 2011): the `dim`-dim space is cut into `m` contiguous
    * subspaces of dim/m dims and each learns its own `ksub`-centroid L2
    * k-means codebook, so a vector compresses to m small codes — the
    * MEMORY axis the IVF family doesn't cover: at 100 TB the candidate
    * index flowing through the cell join carries m bytes per vector
    * instead of 8·dim.
    *
    * Determinism contract (trainCells', in the L2 metric): seeds are the
    * `ksub` vectors ranked by (md5(id), id), sliced per subspace;
    * assignment = round-6 squared-L2 argmin with min-code tiebreak;
    * update = per-dim member mean rounded to 6. All m subspaces train in
    * ONE job per Lloyd iteration — the training frame is the exploded
    * (sub, subvector) long table, assignment a map stage against the full
    * nested codebook literal, the update one partial-aggregated shuffle
    * of m·ksub·(dim/m) rounded means. Codes emptied during training drop
    * out (GROUP BY semantics, consistent across engines); surviving codes
    * are RENUMBERED dense per subspace at the end, so downstream ADC
    * lookup tables can be indexed positionally.
    *
    * Returns (sub, code, centroid) ordered by (sub, code); train on a
    * deterministic sample via `sampleFraction` at scale (centroids are
    * distributional estimates — the [[trainCells]] argument). */
  def trainPq(emb: DataFrame, m: Int, ksub: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "e",
      sampleFraction: Double = 1.0): Array[(Int, Int, Array[Double])] = {
    val train =
      if (sampleFraction >= 1.0) emb
      else graft.analytics.Sampling.bernoulli(emb, idCol, sampleFraction)
    val seeds = train
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(ksub)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sd = dim / m
    var cents: Array[(Int, Int, Array[Double])] =
      (for (s <- 0 until m; (v, j) <- seeds.zipWithIndex.toSeq)
        yield (s, j, v.slice(s * sd, (s + 1) * sd))).toArray
    // one row per (vector, subspace): every subspace trains in the same job
    val longDf = train
      .select(col(idCol), posexplode(subVectors(col(vecCol), m, sd)))
      .select(col(idCol), col("pos").as("sub"), col("col").as("sv"))
    for (_ <- 1 to iters) {
      val best = bestCode(pqCentsLit(cents, m), col("sub"), col("sv"))
      val assigned = longDf.withColumn("code", best)
      val centCols = (0 until sd).map(i =>
        round(avg(col("sv")(i)), 6).as(s"__c$i"))
      cents = assigned.groupBy(col("sub"), col("code"))
        .agg(centCols.head, centCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), (0 until sd).map(i =>
          r.getDouble(r.fieldIndex(s"__c$i"))).toArray))
        .sortBy(t => (t._1, t._2))
    }
    // dense renumber per subspace (dropped codes close ranks) so code j
    // indexes position j+1 of any code-ordered per-subspace table
    cents.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (s, cs) =>
      cs.sortBy(_._2).zipWithIndex.map { case ((_, _, v), j) => (s, j, v) }
    }.toArray
  }

  /** One row per (vector, subspace) with its PQ `code` — the long-format
    * encode, a shuffle-free map stage (the codebook travels as a nested
    * literal; nothing joins). */
  def pqCodes(emb: DataFrame, cents: Array[(Int, Int, Array[Double])],
      m: Int, idCol: String = "vec_id", vecCol: String = "e"): DataFrame = {
    val sd = cents.head._3.length
    val centsLit = pqCentsLit(cents, m)
    emb
      .select(col(idCol), posexplode(subVectors(col(vecCol), m, sd)))
      .select(col(idCol), col("pos").as("sub"),
        bestCode(centsLit, col("pos"), col("col")).as("code"))
  }

  /** The m-code array of `vec` (wide form — what the candidate side of
    * [[pqAdcRefineTopK]] carries through the cell join: m ints in place
    * of 8·dim bytes of vector). */
  private def pqCodeArray(vec: Column,
      cents: Array[(Int, Int, Array[Double])], m: Int): Column = {
    val sd = cents.head._3.length
    val centsLit = pqCentsLit(cents, m)
    transform(sequence(lit(0), lit(m - 1)), s =>
      bestCode(centsLit, s, slice(vec, s * sd + 1, lit(sd))))
  }

  /** IVF-PQ search with exact refine — the full 100 TB ANN memory story:
    * candidates prune by trained coarse cell ([[assignCells]]), the big
    * cell join scores candidates ASYMMETRICALLY from their m-byte PQ codes
    * (exact query × quantized candidate), a per-query `shortlist`
    * survives, and only shortlist×queries full vectors are gathered for
    * the exact round-6 cosine re-rank ([[ivfRefineTopK]]'s stage-2
    * contract; same output schema).
    *
    * The ADC trick: each query precomputes a lookup table lut[s][j] =
    * round(⟨q_s, centroid(s, j)⟩, 6) (m·ksub doubles, one map stage), so
    * scoring a candidate is m positional lookups + a sequential sum — no
    * per-pair vector arithmetic at all. The shortlist ranks by the
    * quantized COSINE (the refine metric), i.e. the lookup sum divided by
    * the candidate's reconstructed norm — recomputed from its codes ONCE
    * per candidate, never per pair (the raw inner product misranks
    * small-norm candidates and measurably starves the shortlist). Every
    * term is round-6 of a fixed-order fold and codes are
    * dense-renumbered, so the DuckDB oracle reproduces scores
    * bit-for-bit.
    *
    * `probes` / `assignProbes` are the same recall knobs as
    * [[ivfMultiProbeTopK]]'s (query probes its p nearest cells; each
    * candidate is indexed under its a nearest): single-probe recall is
    * CELL-coverage-bounded (the q66 ceiling), so a production config
    * buys recall with (p, a) and memory with PQ — the knobs compose
    * because the candidate payload through the bigger probed join is
    * still m bytes. A pair reachable through several shared cells scores
    * the same ADC value (the lut is cell-independent), so the pair
    * stream is DISTINCT-ed before the shortlist window when either knob
    * exceeds 1. Defaults keep q104's single-probe contract. */
  def pqAdcRefineTopK(emb: DataFrame, coarse: Array[(Int, Array[Double])],
      pq: Array[(Int, Int, Array[Double])], m: Int, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "e",
      probes: Int = 1, assignProbes: Int = 1,
      exactNorms: Boolean = false): DataFrame =
    pqAdcSearchTopK(emb, emb, coarse, pq, m, k, shortlist, idCol, vecCol,
      probes, assignProbes, exactNorms, excludeSelf = true)

  /** The TWO-TABLE form of [[pqAdcRefineTopK]] — the serving shape: a
    * (typically small) QUERY batch searched against a separately-indexed
    * CANDIDATE corpus, e.g. "embed today's batch, find its top-k in the
    * 100 TB index". Identical ADC + exact-refine contract; the candidate
    * index (cells, codes, norms) is built from `candDf` alone and the
    * query side only ever contributes lookup tables, so an incremental
    * consumer can encode the corpus once and stream query batches
    * against it. `excludeSelf` drops same-id pairs — self-search
    * ([[pqAdcRefineTopK]]) sets it; disjoint query/candidate tables
    * leave it off. */
  def pqAdcSearchTopK(queryDf: DataFrame, candDf: DataFrame,
      coarse: Array[(Int, Array[Double])],
      pq: Array[(Int, Int, Array[Double])], m: Int, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "e",
      probes: Int = 1, assignProbes: Int = 1,
      exactNorms: Boolean = false,
      excludeSelf: Boolean = false): DataFrame = {
    val sd = pq.head._3.length
    val centsLit = pqCentsLit(pq, m)
    val assigned =
      if (assignProbes <= 1) assignCells(candDf, coarse, idCol, vecCol)
      else probeCells(candDf, coarse, assignProbes, idCol, vecCol)
    // reconstructed squared norm from the codes: per subspace the round-6
    // sequential sum of squares of the selected centroid, summed in
    // subspace order — the same fold shape as the score, so the oracle
    // matches bitwise; position code+1 is valid by dense renumbering
    val nrmSq = aggregate(
      zip_with(sequence(lit(0), lit(m - 1)), col("__codes"), (s, c) =>
        round(aggregate(
          transform(element_at(element_at(centsLit, s + 1), c + 1)
            .getField("centroid"), x => x * x),
          lit(0.0), (acc, v) => acc + v), 6)),
      lit(0.0), (acc, v) => acc + v)
    // `exactNorms` swaps the code-reconstructed denominator for the
    // candidate's TRUE round-6 norm, computed from the full vector
    // BEFORE it is dropped — the index then carries m bytes + one
    // double per vector (the FAISS precomputed-norms trick): the
    // quantization error leaves the denominator entirely, and the ADC
    // ranking error reduces to the numerator's ⟨q, recon−c⟩ term.
    // Same sequential round-6 fold as the reconstructed path, so the
    // oracle reproduces either choice bitwise.
    val trueNrmSq = round(aggregate(
      transform(col("__e"), x => x * x),
      lit(0.0), (acc, v) => acc + v), 6)
    val cand0 = assigned.select(col(idCol).as("neighbor_id"), col("cell"),
      pqCodeArray(col(vecCol), pq, m).as("__codes"),
      col(vecCol).as("__e"))
    val cand = (
      if (exactNorms) cand0.withColumn("__cnrm",
        sqrt(greatest(trueNrmSq, lit(1e-300))))
      else cand0.withColumn("__cnrm", sqrt(greatest(nrmSq, lit(1e-300)))))
      .drop("__e")
    val lut = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(centsLit, s + 1), c =>
        round(graft.functions.DotProduct(
          slice(col(vecCol), s * sd + 1, lit(sd)),
          c.getField("centroid")), 6)))
    // Build the query side EXPLICITLY (never reuse `assigned`): with
    // probes=1 each query must probe only its single nearest cell even
    // when assignProbes>1 replicated the candidate index — reusing the
    // a-probed assignment here would silently inflate query-side probes
    // to a (≈a× join cost), violating the documented p knob.
    val queries = (
      if (probes <= 1) assignCells(queryDf, coarse, idCol, vecCol)
      else probeCells(queryDf, coarse, probes, idCol, vecCol))
      .select(col(idCol), col("cell"), lut.as("__lut"))
    val adc = aggregate(
      zip_with(col("__lut"), col("__codes"),
        (l, c) => element_at(l, c + 1)),
      lit(0.0), (acc, v) => acc + v) / col("__cnrm")
    val joined = queries.join(cand, "cell")
    val pairs = (
      if (excludeSelf) joined.where(col(idCol) =!= col("neighbor_id"))
      else joined)
      .select(col(idCol), col("neighbor_id"), round(adc, 6).as("__adc"))
    // same (query, neighbor) via several shared cells scores identically
    // (the lut is cell-independent) — dedup before the shortlist window
    val deduped =
      if (probes <= 1 && assignProbes <= 1) pairs else pairs.distinct()
    val short = deduped
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("__adc").desc, col("neighbor_id"))))
      .where(col("rk") <= shortlist)
      .select(col(idCol), col("neighbor_id"))
    val cos = CosineSimilarity(col("__qe"), col("__ne"))
    short
      .join(queryDf.select(col(idCol), col(vecCol).as("__qe")), idCol)
      .join(candDf.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__ne")), "neighbor_id")
      .select(col(idCol), round(cos, 6).as("cos_sim"), col("neighbor_id"))
      .withColumn("rk", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .where(col("rk") <= k)
      .drop("rk")
  }
}
