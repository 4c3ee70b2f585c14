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
    val spark = candidates.sparkSession
    val cos = CosineSimilarity(spark)(col(queryVec), col(candVec))
    candidates.crossJoin(broadcast(queries))
      .select(col(queryId), col(candId), round(cos, 6).as("cos_sim"))
      .withColumn("rk", row_number().over(Window.partitionBy(col(queryId))
        .orderBy(col("cos_sim").desc, col(candId))))
      .where(col("rk") <= k)
      .drop("rk")
  }

  /** Top-k neighbors per vector, searched only within the vector's coarse
    * cell (`labelCol`) — IVF-style pruning; the cell is the shuffle key. */
  def ivfTopK(emb: DataFrame, k: Int, idCol: String = "vec_id",
      labelCol: String = "label", vecCol: String = "e"): DataFrame = {
    val spark = emb.sparkSession
    val a = emb.select(col(idCol), col(labelCol), col(vecCol))
    val b = emb.select(col(idCol).as("neighbor_id"), col(labelCol),
      col(vecCol).as("__ne"))
    val cos = CosineSimilarity(spark)(col(vecCol), col("__ne"))
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
    * (integer weights, engine-portable) — the cosine-LSH shuffle key. */
  def hyperplaneBucket(vecCol: Column, dim: Int, planes: Int): Column = {
    def weight(p: Int, j: Int): Long =
      ((p.toLong * dim + j) * 2654435761L) % 97 - 48
    val bits = (0 until planes).map { p =>
      val hp = array((0 until dim).map(j => lit(weight(p, j).toDouble)): _*)
      when(aggregate(zip_with(vecCol, hp, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Global top-k most-similar pairs, exact — `orderBy().limit()` plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge), never a
    * single-partition window. */
  def topKPairs(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "e"): DataFrame = {
    val spark = emb.sparkSession
    val cos = CosineSimilarity(spark)(col("__ae"), col("__be"))
    emb.select(col(idCol).as("id_a"), col(vecCol).as("__ae"))
      .join(emb.select(col(idCol).as("id_b"), col(vecCol).as("__be")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(k)
  }
}
