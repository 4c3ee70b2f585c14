package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Dev measurement harness (not a test): the PQ shortlist-recall levers at
  * the PLANS.md operating point (sf0.1, coarse k=8/i=2, PQ m=8/ksub=16/i=2,
  * p=4/a=2) — baseline vs the OPQ-lite variance-balanced permutation vs
  * exact candidate norms, separately and composed. Writes the numbers
  * PLANS.md cites. Usage: sbt "Test/runMain graft.similarity.OpqTuning"
  */
object OpqTuning {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("opq-tuning")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val K = 3
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .cache()
    def topkMap(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("vec_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0)).map { case (id, rs) =>
          id -> rs.map(_.getLong(1)).toSet
        }
    val exact = topkMap(
      Similarity.ivfTopK(emb.withColumn("c0", lit(0)), K, labelCol = "c0"))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hit = exact.iterator.map { case (id, ex) =>
        (ex intersect approx.getOrElse(id, Set.empty)).size
      }.sum
      hit.toDouble / (exact.size * K)
    }
    def measure(name: String, frame: DataFrame, s: Int,
        exactNorms: Boolean, ksub: Int = 16): Unit = {
      val cc = Similarity.trainCells(frame, k = 8, iters = 2)
      val pq = Similarity.trainPq(frame, m = 8, ksub = ksub, iters = 2)
      val t0 = System.nanoTime()
      val r = recall(topkMap(Similarity.pqAdcRefineTopK(
        frame, cc, pq, m = 8, k = K, shortlist = s,
        probes = 4, assignProbes = 2, exactNorms = exactNorms)))
      println(f"[opq] $name%-28s s=$s%-3d recall@$K = $r%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    val perm = Similarity.varianceBalancedPerm(emb, m = 8, dim = 64)
    println(s"[opq] perm = ${perm.mkString(",")}")
    val permuted = emb
      .select(col("vec_id"), Similarity.permuteVec(col("e"), perm).as("e"))
      .cache()
    for (s <- Seq(256, 384)) {
      measure("ksub=64", emb, s, exactNorms = false, ksub = 64)
      measure("ksub=256 (1-byte codes)", emb, s, exactNorms = false,
        ksub = 256)
      measure("ksub=256+opq-perm", permuted, s, exactNorms = false,
        ksub = 256)
    }
    spark.stop()
  }
}
