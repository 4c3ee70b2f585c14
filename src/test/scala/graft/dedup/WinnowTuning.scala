package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch analysis (Test/runMain graft.dedup.WinnowTuning <sfDir>):
  * distribution of UNCAPPED winnowing shared/overlap for true vs false
  * candidate pairs — picks the q64 second-chance decision rule. */
object WinnowTuning {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("winnow-tuning")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import graft.queries.Tables

    val docs = Tables.sharded(spark, dir, "documents", "doc_id")
    val grams = graft.dedup.Dedup.shingles(docs).cache()
    val eg = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val sizes = grams.select(col("doc_id"), size(col("grams")).as("n"))
    // exact truth
    val truth = eg.as("a")
      .join(eg.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(col("common") / (col("na") + col("nb") - col("common")) >= 0.5)
      .select(col("doc_a"), col("doc_b")).cache()
    println(s"[tune] true pairs: ${truth.count()}")

    val win = graft.text.TextStats.winnowing(docs).cache()
    val nf = win.select(col("doc_id"), size(col("fingerprints")).as("n_fp"))
    val e = win.select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    val DfCap = 20
    val rare = e.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .where(col("c") <= DfCap).select(col("fp"))
    val er = e.join(rare, "fp")
    val fpCands = er.as("a")
      .join(er.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val bands = graft.dedup.Dedup.minhashBands(grams, k = 12, rowsPerBand = 3)
    val lshCands = graft.dedup.Dedup.lshCandidates(bands)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val cands = fpCands.union(lshCands).distinct().cache()
    println(s"[tune] candidates: ${cands.count()} (fp-only would be fewer)")

    // uncapped + capped shared per candidate
    def sharedOver(src: org.apache.spark.sql.DataFrame, tag: String) =
      cands
        .join(src.select(col("doc_id").as("doc_a"), col("fp")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("fp").as("__bfp")),
          Seq("doc_b"))
        .where(col("fp") === col("__bfp"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as(s"shared_$tag"))
    val full = sharedOver(e, "full")
    val capped = sharedOver(er, "cap")
    val scored = cands
      .join(full, Seq("doc_a", "doc_b"), "left")
      .join(capped, Seq("doc_a", "doc_b"), "left")
      .na.fill(0, Seq("shared_full", "shared_cap"))
      .join(nf.select(col("doc_id").as("doc_a"), col("n_fp").as("na")), "doc_a")
      .join(nf.select(col("doc_id").as("doc_b"), col("n_fp").as("nb")), "doc_b")
      .withColumn("ov_full", col("shared_full") / least(col("na"), col("nb")))
      .withColumn("ov_cap", col("shared_cap") / least(col("na"), col("nb")))
      .join(truth.withColumn("is_true", lit(true)), Seq("doc_a", "doc_b"), "left")
      .na.fill(false, Seq("is_true"))
      .cache()

    for (t <- Seq(true, false)) {
      val g = scored.where(col("is_true") === t)
      println(s"[tune] label=$t n=${g.count()}")
      g.select(
        min("shared_full"), expr("percentile(shared_full, 0.05)"),
        expr("percentile(shared_full, 0.5)"), max("shared_full"),
        min("ov_full"), expr("percentile(ov_full, 0.05)"),
        expr("percentile(ov_full, 0.5)"), expr("percentile(ov_full, 0.95)"),
        expr("percentile(ov_full, 0.99)"), max("ov_full"))
        .collect().foreach(r => println(s"[tune]   full: $r"))
      g.select(
        min("shared_cap"), expr("percentile(shared_cap, 0.5)"), max("shared_cap"),
        min("ov_cap"), expr("percentile(ov_cap, 0.5)"), max("ov_cap"))
        .collect().foreach(r => println(s"[tune]   cap : $r"))
    }
    // how would rule variants do?
    def eval(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val kept = scored.where(cond)
      val tp = kept.where(col("is_true")).count()
      val fp = kept.where(!col("is_true")).count()
      val truthN = truth.count()
      println(s"[tune] rule $name: tp=$tp/$truthN fp=$fp")
    }
    eval("cap10_or_capov0.4", col("shared_cap") >= 10 || col("ov_cap") >= 0.4)
    eval("fullov0.4", col("ov_full") >= 0.4)
    eval("fullov0.5", col("ov_full") >= 0.5)
    eval("cap_rule_or_fullov0.4",
      col("shared_cap") >= 10 || col("ov_cap") >= 0.4 || col("ov_full") >= 0.4)
    eval("cap_rule_or_fullov0.5",
      col("shared_cap") >= 10 || col("ov_cap") >= 0.4 || col("ov_full") >= 0.5)
    eval("fullov0.7", col("ov_full") >= 0.7)
    eval("fullov0.75", col("ov_full") >= 0.75)
    eval("fullov0.8", col("ov_full") >= 0.8)
    spark.stop()
  }
}
