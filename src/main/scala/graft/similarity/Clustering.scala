package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-corpus Lloyd k-means as relational algebra — the general
  * clustering operator beside the sample-trained quantizers in
  * [[Similarity]] (IVF/PQ train on bounded samples; Lloyd here assigns and
  * updates over the WHOLE corpus, the shape used for SemDeDup-style
  * cluster-then-prune curation and mixture analysis).
  *
  * Scale shape, per round: assignment is a PURE MAP stage — the k×d
  * centroid table is a driver-scalar-sized literal baked into one codegen'd
  * expression (the broadcast-centroids pattern every distributed k-means
  * uses), so no join and no shuffle touches the corpus. The update is one
  * keyed aggregate over (cluster, dim) with map-side partials — exactly k·d
  * rows cross the exchange regardless of corpus size — and the collect that
  * follows is k·d longs (same driver-scalar contract as the IVF/PQ
  * codebooks). The corpus-sized quantized frame has STATIC lineage (scan +
  * project), so each round re-derives it from the source scan — nothing
  * iterated is corpus-sized, which is why this loop needs no checkpoint
  * barrier (contrast `Spectral.topEigen`, whose accumulator is itself a
  * frame).
  *
  * Determinism contract (what lets a DuckDB oracle replay the run
  * bit-for-bit): all arithmetic is INTEGER-exact. Vectors are quantized to
  * ⌊x·scale⌋ once up front; distances are integer sums of squares;
  * centroid updates floor-divide integer sums (Math.floorDiv — identical
  * to SQL floor(sum/cnt) at these magnitudes); the argmin encodes
  * (distance, cluster) into ONE long — dist·2²⁰ + cid — so ties break
  * toward the smaller cluster id in both engines by construction. Float
  * k-means argmins flip across engines on ULP-level summation-order noise;
  * quantized k-means trades ~1/scale of resolution for cross-engine
  * reproducibility, the right trade for a curation pipeline that must be
  * re-runnable.
  */
object Clustering {

  /** cid occupies the low CidBits of the encoded (dist, cid) long. */
  private val CidBits = 20
  private val CidCap = 1L << CidBits

  /** Quantized integer vector: element i = ⌊vec(i)·scale⌋ (floor, not
    * round — floats exactly on a rounding boundary would tie-break
    * differently across engines; floor never ties). */
  def quantized(vecCol: Column, scale: Int): Column =
    transform(vecCol, x => floor(x.cast("double") * lit(scale)).cast("long"))

  /** Lloyd k-means over `vecs(idCol, vecCol: array<float|double>)`.
    * Seeds: the k vectors with smallest id, each cluster labeled by its
    * seed's id (deterministic, init-order-free). `rounds` assignment
    * passes run with a centroid update between consecutive passes. A
    * cluster that loses every member simply drops out of later rounds
    * (standard Lloyd degeneracy; the seed ids make the loss visible).
    *
    * Returns (idCol, cluster, dist2) — the final assignment with its
    * squared quantized distance. */
  def lloyd(vecs: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 4, rounds: Int = 3,
      scale: Int = 1000): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got $k/$rounds")
    val q = vecs.select(col(idCol), quantized(col(vecCol), scale).as("__q"))

    // seeds: k smallest ids — k·d longs on the driver, the same
    // scalar-size contract as the IVF/PQ codebook collects
    var cents: Seq[(Long, Array[Long])] = q.orderBy(col(idCol)).limit(k)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq
    cents.foreach { case (cid, _) =>
      require(cid >= 0 && cid < CidCap,
        s"cluster label $cid outside [0, $CidCap) — the (dist, cid) " +
          "encoding needs small non-negative seed ids") }

    def encodedArgmin(): Column =
      cents.map { case (cid, cq) =>
        val dist = aggregate(
          zip_with(col("__q"), typedLit(cq), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)
        dist * lit(CidCap) + lit(cid)
      }.reduce(least(_, _))

    var r = 1
    while (r < rounds) {
      // update: one (cluster, dim) keyed aggregate, k·d rows out
      val updated = q
        .withColumn("__cid", pmod(encodedArgmin(), lit(CidCap)))
        .select(col("__cid"), posexplode(col("__q")).as(Seq("__d", "__v")))
        .groupBy(col("__cid"), col("__d"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      cents = updated
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val byDim = rows.map(row => row.getInt(1) ->
            Math.floorDiv(row.getLong(2), row.getLong(3))).toMap
          cid -> Array.tabulate(byDim.size)(byDim)
        }
        .toSeq.sortBy(_._1)
      r += 1
    }
    q.withColumn("__comb", encodedArgmin())
      .select(col(idCol),
        pmod(col("__comb"), lit(CidCap)).as("cluster"),
        (col("__comb") - pmod(col("__comb"), lit(CidCap)))
          .divide(lit(CidCap)).cast("long").as("dist2"))
  }
}
