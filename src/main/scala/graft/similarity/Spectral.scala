package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
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
    * trace-explained ratio as constant columns (ev, explained).
    *
    * The iteration itself runs DRIVER-SIDE on the collected d² cells —
    * the bounded-collect class (4096 doubles at d=64, the same bound as
    * k×d centroids), independent of corpus size. The first version ran
    * each of the `iters` rounds as Spark jobs on d-sized frames
    * (join + agg + normalize + checkpoint ≈ 6 driver-synchronized jobs
    * per round): pure fixed scheduler overhead on zero data, and
    * exactly the cost a loaded driver amplifies — the r16 bench showed
    * that family at 10× under driver-host contention while the one
    * corpus-sized stage (the Gram build) was unaffected. At 100 TB the
    * split is the same: aggregate Gram distributed once, eigensolve the
    * d×d result where it fits. */
  def topEigen(gram: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = gram.sparkSession
    // ONE bounded collect of the d² cells (missing cells = 0), packed
    // dense; all arithmetic below is a deterministic fixed-order loop
    val g = Array.ofDim[Double](dim * dim)
    gram.select(col("i").cast("int"), col("j").cast("int"),
        col("g").cast("double"))
      .collect().foreach(r => g(r.getInt(0) * dim + r.getInt(1)) =
        r.getDouble(2))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    val w = Array.ofDim[Double](dim)
    for (_ <- 1 to iters) {
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += g(i * dim + j) * v(j); j += 1 }
        w(i) = s; i += 1
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      i = 0
      while (i < dim) { v(i) = w(i) / nrm; i += 1 }
    }
    // Rayleigh quotient λ = vᵀGv (‖v‖=1 after the last normalize) and
    // the variance share λ/tr(G)
    val gv = Array.tabulate(dim) { i =>
      var s = 0.0; var j = 0
      while (j < dim) { s += g(i * dim + j) * v(j); j += 1 }
      s
    }
    val lam = gv.zip(v).map { case (a, b) => a * b }.sum
    val tr = (0 until dim).map(i => g(i * dim + i)).sum
    // sign canon: s = sign of v at the smallest index attaining max |v|
    val mx = v.map(math.abs).max
    val sgn = math.signum(v(v.indexWhere(x => math.abs(x) == mx)))
    spark.createDataFrame(spark.sparkContext.parallelize(
        (0 until dim).map(i => Row(i, v(i) * sgn, lam, lam / tr)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("ev",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("explained",
          org.apache.spark.sql.types.DoubleType))))
  }
}
