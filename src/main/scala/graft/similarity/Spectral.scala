package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral analysis of an embedding corpus as DataFrame algebra — the
  * PCA-shaped preprocessing of vector pipelines (whitening, anisotropy
  * diagnosis, "is one direction eating the variance" checks before ANN
  * index tuning). Public method: power iteration on the covariance/Gram
  * matrix (Mises–Pollaczek-Geiringer iteration; PCA per Pearson/Hotelling
  * — all public knowledge).
  *
  * Scale anatomy: the ONLY corpus-sized stage is the Gram accumulation —
  * (i,j) cell sums with map-side partial aggregation, d² bounded cells
  * (4096 at d=64) through one exchange regardless of corpus size. Every
  * power-iteration step then runs on d²- and d-sized frames: a cell⋈vector
  * equi-join, a per-row keyed sum, and a broadcast 1-row norm — no driver
  * state, no N-sized anything after the first pass. */
object Spectral {

  /** Mean-centered Gram/covariance cells of `emb` (idCol, e: array):
    * (i, j, g) with g = Σ_n (x_ni − μ_i)(x_nj − μ_j) / N, dims 0-based.
    * PERSIST the result before iterating on it (the q133 lesson: a loop
    * re-references its input once per round). */
  def gramMatrix(emb: DataFrame, eCol: String = "e"): DataFrame = {
    val xi = emb.select(posexplode(col(eCol)).as(Seq("i", "x")))
    val mu = xi.groupBy(col("i")).agg(avg(col("x")).as("mu"))
    // the per-dim means as ONE broadcast array row (sorted by dim —
    // struct ordering sorts on the leading unique i), so centering is a
    // zip_with map, not a join
    val muArr = mu.agg(transform(
      array_sort(collect_list(struct(col("i"), col("mu")))),
      s => s("mu")).as("__mu"))
    val n = emb.agg(count(lit(1)).cast("double").as("n"))
    // Per-row outer product via two stacked generators: N·d² cell rows
    // materialize map-side and partial-aggregate into d² cells per
    // partition BEFORE the exchange — the only shuffle in the whole
    // build is the 4096-cell final aggregate. (The first version
    // self-joined the exploded corpus on the row id: a corpus-sized
    // sort-merge shuffle carrying N·d rows per side, caught by
    // PlanAuditSpec — at 100 TB that shuffle IS the job. This shape has
    // no corpus-sized exchange at all.)
    emb.crossJoin(broadcast(muArr))
      .select(zip_with(col(eCol), col("__mu"), (x, m) => x - m).as("c"))
      .select(posexplode(col("c")).as(Seq("i", "ci")), col("c"))
      .select(col("i"), col("ci"), posexplode(col("c")).as(Seq("j", "cj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("ci") * col("cj")).as("s"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), (col("s") / col("n")).as("g"))
  }

  /** Top eigenvector of `gram` (i, j, g) by `iters` fixed power-iteration
    * steps from the uniform start — a pure deterministic function of the
    * matrix (no convergence test, no randomness). Sign is canonicalized
    * so the largest-|loading| coordinate (lowest index on ties) is
    * positive. Returns (i, v) plus the Rayleigh eigenvalue and
    * trace-explained ratio as constant columns (ev, explained). */
  def topEigen(gram: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = gram.sparkSession
    import spark.implicits._
    // v re-derives from gram after one round — aliases keep the
    // self-join resolution unambiguous (the pageRank convention)
    var v: DataFrame = (0 until dim).map(i => (i, 1.0 / math.sqrt(dim)))
      .toDF("j", "v")
    for (_ <- 1 to iters) {
      val w = gram.alias("g").join(v.alias("vv"), col("g.j") === col("vv.j"))
        .groupBy(col("g.i").as("i"))
        .agg(sum(col("g.g") * col("vv.v")).as("w"))
      val nrm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      // localCheckpoint truncates the loop lineage every round: without
      // it the logical plan (gram + TWO references to the previous v)
      // grows ~2^k and Catalyst analysis hangs well before execution
      // would (observed: 2×2 matrix, 25 iters, 10-minute optimizer
      // stall). The vector is d rows — materializing it is free.
      // flatCheckpoint: truncate lineage AND origin statistics — the
      // per-round join-product sizeInBytes would otherwise compound
      // across iterations (see Graphs.flatCheckpoint)
      v = graft.analytics.Graphs.flatCheckpoint(
        w.crossJoin(broadcast(nrm))
          .select(col("i").as("j"), (col("w") / col("nrm")).as("v")))
    }
    val vec = v.select(col("j").as("i"), col("v"))
    // Rayleigh quotient λ = vᵀGv (‖v‖=1 after the last normalize) and the
    // variance share λ/tr(G)
    val gv = gram.alias("g")
      .join(vec.select(col("i").as("j"), col("v")).alias("vv"),
        col("g.j") === col("vv.j"))
      .groupBy(col("g.i").as("i"))
      .agg(sum(col("g.g") * col("vv.v")).as("w"))
    val lam = gv.alias("w").join(broadcast(vec.alias("vv")),
        col("w.i") === col("vv.i"))
      .agg(sum(col("w.w") * col("vv.v")).as("ev"))
    val tr = gram.where(col("i") === col("j"))
      .agg(sum(col("g")).as("tr"))
    // sign canon: s = sign of v at the smallest index attaining max |v|
    val sgn = vec.crossJoin(broadcast(
        vec.agg(max(abs(col("v"))).as("mx"))))
      .where(abs(col("v")) === col("mx"))
      .agg(min_by(signum(col("v")), col("i")).as("s"))
    vec.crossJoin(broadcast(sgn))
      .crossJoin(broadcast(lam))
      .crossJoin(broadcast(tr))
      .select(col("i"), (col("v") * col("s")).as("v"),
        col("ev"), (col("ev") / col("tr")).as("explained"))
  }
}
