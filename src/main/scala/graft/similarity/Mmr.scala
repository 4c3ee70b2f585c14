package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998,
  * public method): greedily pick k items maximizing
  * λ·relevance − (1−λ)·max cosine to the already-selected set — the
  * curation shape for "top-k relevant but DIVERSE" (few-shot example
  * selection, demo-set dedup, context packing), where plain top-k by
  * relevance returns k near-copies of the same document.
  *
  * Scale shape, per round: ONE distributed argmax (TakeOrderedAndProject —
  * map-side top-1 per partition, k·1 rows to the driver) over a pure map
  * stage — the selected set is ≤ k vectors of d doubles, baked into the
  * scoring expression as literals (the same driver-scalar contract as the
  * k-means centroids), so no join ever touches the corpus. k rounds total;
  * the corpus-sized frame has static lineage and re-derives from the scan
  * per round.
  *
  * Determinism contract: every pairwise cosine is round-6 (absorbing
  * summation-order ULP noise, the engine-wide convention), λ-arithmetic on
  * those rounded values is exact IEEE (same doubles, same single multiply/
  * subtract on both engines), and every argmax tie-breaks on min id — so a
  * SQL oracle replays the full greedy trajectory exactly (q148). */
object Mmr {

  /** Normalized candidate frame `select` scores each round:
    * (idCol long, __v double array, __rel, __nrm). A zero-norm (or
    * NaN-element) vector fails LOUDLY here — its cosine against anything
    * is null/NaN, which would silently poison every later round's argmax
    * (same loud-failure contract as dedupUnits' NULL guard). */
  def prepared(vecs: DataFrame, relCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    vecs.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"),
      col(relCol).cast("double").as("__rel"))
      .withColumn("__nrm", {
        val n = sqrt(aggregate(
          transform(col("__v"), x => x * x), lit(0d), (a, x) => a + x))
        // n > 0 is false for NaN too, so both degeneracies raise
        when(n > lit(0d), n).otherwise(raise_error(concat(
          lit(s"Mmr: zero-norm or NaN vector at $idCol="),
          col(idCol).cast("string"))))
      })

  /** The EXACT frame one greedy round of [[select]] executes against a
    * [[prepared]] base: already-selected ids filtered out, MMR scored
    * with the selected vectors baked in as literals, argmax as
    * orderBy+limit(1) (plans as TakeOrderedAndProject — map-side top-1).
    * Public so the plan audit pins this real per-round plan, not a
    * hand-rebuilt approximation. `selected` rows are (id, vector, norm). */
  def roundFrame(base: DataFrame,
      selected: Seq[(Long, Array[Double], Double)], lambda: Double,
      idCol: String = "vec_id"): DataFrame = {
    def cosTo(v: Array[Double], nrm: Double): Column = {
      val dot = aggregate(zip_with(col("__v"), typedLit(v),
        (a, b) => a * b), lit(0d), (a, x) => a + x)
      round(dot / (col("__nrm") * lit(nrm)), 6)
    }
    val scored =
      if (selected.isEmpty) base.withColumn("__mmr", col("__rel"))
      else {
        val maxCos = selected.map(s => cosTo(s._2, s._3))
          .reduce((a, b) => greatest(a, b))
        base.where(!col(idCol).isin(selected.map(_._1): _*))
          .withColumn("__mmr",
            round(lit(lambda) * col("__rel") - lit(1 - lambda) * maxCos, 6))
      }
    scored.orderBy(col("__mmr").desc, col(idCol))
      .select(col(idCol), col("__v"), col("__nrm"), col("__mmr"))
      .limit(1)
  }

  /** Select `k` rows from `vecs(idCol, vecCol, relCol)`; `relCol` is the
    * caller's relevance score (round it to 6 decimals if it comes from
    * float math — the oracle contract needs stable inputs). Returns
    * (rank, idCol, mmr): selection order 1..k and the MMR value at
    * selection time (round 1's value is the bare relevance). */
  def select(vecs: DataFrame, relCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 4,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda $lambda outside [0, 1]")
    val spark = vecs.sparkSession
    val base = prepared(vecs, relCol, idCol, vecCol)

    var selected = List.empty[(Long, Array[Double], Double)] // id, v, nrm
    val picks = Seq.newBuilder[(Long, Long, Double)]         // rank, id, mmr
    var rank = 1
    while (rank <= k) {
      val top = roundFrame(base, selected, lambda, idCol).collect()
      if (top.isEmpty) rank = k + 1 // fewer than k candidates: stop
      else {
        val r: Row = top.head
        val v = r.getSeq[Double](1).toArray
        selected ::= ((r.getLong(0), v, r.getDouble(2)))
        picks += ((rank.toLong, r.getLong(0), r.getDouble(3)))
        rank += 1
      }
    }
    import spark.implicits._
    picks.result().toDF("rank", idCol, "mmr")
  }
}
