package graft.gen

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Truncated multivariate-Student-t sample generator (≙ dataGeneration/
  * psd.R:4-19, G1 in SURVEY §2.3): Gibbs sampler over the scale-mixture
  * representation  x | w ~ N(μ, Σ/w),  w ~ Gamma(df/2, df/2), with each
  * coordinate drawn from its conditional truncated normal via inverse-CDF.
  * (Plain rejection sampling is hopeless here: with sd ≈ 6 truncated to
  * ±0.1 the acceptance rate is ~1e-10 — the reference uses Gibbs for the
  * same reason, psd.R:18 `algorithm = 'gibbs'`.)
  *
  * Distributed design: one independent chain per partition, deterministically
  * seeded by (seed, partitionId) — embarrassingly parallel, restart-stable,
  * and scales linearly with executors. Burn-in + thinning per chain.
  */
final case class GenConfig(
    mu: Array[Double],
    sigma: Array[Array[Double]],
    df: Int,
    lower: Double,
    upper: Double,
    burnIn: Int = 200,
    thin: Int = 2)

object Generator {

  /** Parameters of the reference generator (psd.R:4-15; Σ is symmetric so
    * R's column-major fill equals the row-major literal below). */
  val ReferenceConfig: GenConfig = GenConfig(
    mu = Array(0.002, 0.004, 0.003, 0.002, 0.001, 0.003),
    sigma = Array(
      Array(36, -2, -6, -1, 13, -1),
      Array(-2, 1, -1, 0, -1, -1),
      Array(-6, -1, 9, 1, 5, 0),
      Array(-1, 0, 1, 1, -1, 0),
      Array(13, -1, 5, -1, 25, -6),
      Array(-1, -1, 0, 0, -6, 4)).map(_.map(_.toDouble)),
    df = 4, lower = -0.1, upper = 0.1)

  /** n samples as a DataFrame(a0..a5), `partitions` independent chains. */
  def sample(spark: SparkSession, n: Long, partitions: Int, seed: Long,
      cfg: GenConfig = ReferenceConfig): DataFrame = {
    val d = cfg.mu.length
    val omega = invert(cfg.sigma)
    val schema = StructType((0 until d).map(i =>
      StructField(s"a$i", DoubleType, nullable = false)))
    val rdd = spark.range(0, n, 1, partitions).rdd.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val chain = new GibbsChain(cfg, omega, seed * 1000003L + pid)
      chain.warmUp()
      it.map { _ => Row.fromSeq(chain.next().toSeq) }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** 6×6 symmetric inverse via Gauss-Jordan (driver-side, one-time). */
  private[gen] def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) m(i)(j) else if (j - n == i) 1.0 else 0.0
    }
    for (col <- 0 until n) {
      val p = (col until n).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(p); a(p) = a(col); a(col) = tmp
      val pv = a(col)(col)
      require(math.abs(pv) > 1e-12, "singular covariance")
      for (j <- 0 until 2 * n) a(col)(j) /= pv
      for (r <- 0 until n if r != col) {
        val f = a(r)(col)
        if (f != 0.0) for (j <- 0 until 2 * n) a(r)(j) -= f * a(col)(j)
      }
    }
    Array.tabulate(n, n)((i, j) => a(i)(j + n))
  }
}

/** One Gibbs chain; not thread-safe, one per partition. */
private[gen] final class GibbsChain(cfg: GenConfig,
    omega: Array[Array[Double]], seed: Long) {
  private val d = cfg.mu.length
  private val rnd = new java.util.Random(seed)
  private val x = cfg.mu.clone() // μ lies inside the box
  private var w = 1.0

  def warmUp(): Unit = (0 until cfg.burnIn).foreach(_ => step())

  def next(): Array[Double] = {
    var i = 0
    while (i < cfg.thin) { step(); i += 1 }
    x.clone()
  }

  private def step(): Unit = {
    // w | x ~ Gamma((df + d)/2, rate (df + δ²)/2), δ² = (x−μ)ᵀΩ(x−μ)
    var delta2 = 0.0
    var i = 0
    while (i < d) {
      var j = 0
      var s = 0.0
      while (j < d) { s += omega(i)(j) * (x(j) - cfg.mu(j)); j += 1 }
      delta2 += (x(i) - cfg.mu(i)) * s
      i += 1
    }
    w = sampleGamma((cfg.df + d) / 2.0, (cfg.df + delta2) / 2.0)
    // x_i | x_-i, w ~ TruncNormal(condMean_i, 1/(w·Ω_ii), lower, upper)
    i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) {
        if (j != i) s += omega(i)(j) * (x(j) - cfg.mu(j))
        j += 1
      }
      val mean = cfg.mu(i) - s / omega(i)(i)
      val sd = math.sqrt(1.0 / (w * omega(i)(i)))
      x(i) = truncNormal(mean, sd, cfg.lower, cfg.upper)
      i += 1
    }
  }

  /** Marsaglia–Tsang for shape ≥ 1 (here shape = (df+d)/2 ≥ 1 always). */
  private def sampleGamma(shape: Double, rate: Double): Double = {
    val dd = shape - 1.0 / 3.0
    val c = 1.0 / math.sqrt(9.0 * dd)
    while (true) {
      var xx = 0.0
      var v = 0.0
      do {
        xx = rnd.nextGaussian()
        v = 1.0 + c * xx
      } while (v <= 0.0)
      v = v * v * v
      val u = rnd.nextDouble()
      if (u < 1.0 - 0.0331 * xx * xx * xx * xx ||
        math.log(u) < 0.5 * xx * xx + dd * (1.0 - v + math.log(v)))
        return dd * v / rate
    }
    0.0 // unreachable
  }

  private def truncNormal(mean: Double, sd: Double, lo: Double,
      hi: Double): Double = {
    val pa = normCdf((lo - mean) / sd)
    val pb = normCdf((hi - mean) / sd)
    val u = pa + rnd.nextDouble() * (pb - pa)
    val z = normInv(math.min(math.max(u, 1e-15), 1 - 1e-15))
    math.min(math.max(mean + sd * z, lo), hi)
  }

  /** Zelen–Severo (A&S 26.2.17), |err| < 7.5e-8. */
  private def normCdf(z: Double): Double = {
    val az = math.abs(z)
    val t = 1.0 / (1.0 + 0.2316419 * az)
    val poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 +
      t * (-1.821255978 + t * 1.330274429))))
    val pdf = math.exp(-0.5 * az * az) / math.sqrt(2 * math.Pi)
    val p = 1.0 - pdf * poly
    if (z >= 0) p else 1.0 - p
  }

  /** Acklam's inverse normal CDF (rel err < 1.15e-9). */
  private def normInv(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val e = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((e(0) * q + e(1)) * q + e(2)) * q + e(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((e(0) * q + e(1)) * q + e(2)) * q + e(3)) * q + 1)
    }
  }
}
