package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (Test/runMain graft.dedup.WinnowRuleCheck <sfDir>): candidate
  * counts and recall of the q64 cap-rule at several thresholds, plus the
  * capped/LSH stats of any true pair the current rule misses. */
object WinnowRuleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("winnow-rule-check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import graft.queries.{Tables, DedupQueries}

    val docs = Tables.sharded(spark, dir, "documents", "doc_id")
    val grams = graft.dedup.Dedup.shingles(docs).cache()
    val eg = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("n"))
    val truth = eg.as("a")
      .join(eg.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
      .select(col("doc_a"), col("doc_b")).cache()
    println(s"[rule] true pairs: ${truth.count()}")

    val win = graft.text.TextStats.winnowing(docs).cache()
    val nf = win.select(col("doc_id"), size(col("fingerprints")).as("n_fp"))
    val e = win.select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    val DfCap = 20
    val rare = e.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .where(col("c") <= DfCap).select(col("fp"))
    val er = e.join(rare, "fp")
    val capScores = er.as("a")
      .join(er.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_cap"))
      .join(nf.select(col("doc_id").as("doc_a"), col("n_fp").as("na")), "doc_a")
      .join(nf.select(col("doc_id").as("doc_b"), col("n_fp").as("nb")), "doc_b")
      .withColumn("ov_cap", col("shared_cap") / least(col("na"), col("nb")))
      .cache()
    val lsh = DedupQueries.lshCandidatePairs(spark, dir)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")).cache()
    println(s"[rule] capScores rows: ${capScores.count()} lsh: ${lsh.count()}")

    for ((sc, ov) <- Seq((10, 0.4), (5, 0.25), (3, 0.15), (2, 0.1))) {
      val capok = capScores
        .where(col("shared_cap") >= sc || col("ov_cap") >= ov)
        .select(col("doc_a"), col("doc_b"))
      val cands = capok.union(lsh).distinct().cache()
      val n = cands.count()
      val tp = cands.join(truth, Seq("doc_a", "doc_b")).count()
      println(s"[rule] sc>=$sc|ov>=$ov: cands=$n tp=$tp/${truth.count()}")
      cands.unpersist()
    }

    // stats of true pairs missed by the r4 rule ∪ LSH
    val capok10 = capScores
      .where(col("shared_cap") >= 10 || col("ov_cap") >= 0.4)
      .select(col("doc_a"), col("doc_b"))
    val missed = truth
      .join(capok10.union(lsh).distinct(), Seq("doc_a", "doc_b"), "left_anti")
    println("[rule] missed true pairs with their capped stats:")
    missed.join(capScores, Seq("doc_a", "doc_b"), "left")
      .collect().foreach(r => println(s"[rule]   $r"))
    spark.stop()
  }
}
