package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Sampling
import graft.dedup.Dedup

/** Classifier-based curation: a multinomial Naive Bayes text classifier
  * trained and applied entirely as joins/aggregations — the engine-native
  * analog of the linear bag-of-words quality/provenance classifiers
  * corpus pipelines train (a fastText-style model is the same shape:
  * per-token class weights summed per document; NB's weights just have a
  * closed form, so training is ONE aggregation instead of SGD).
  *
  * Scale anatomy (nothing touches the driver):
  *  - TRAIN: token-per-class counts — a corpus scan with map-side partial
  *    aggregation into a vocabulary×n_classes table, the only
  *    corpus-sized shuffle of the train half. Class totals and priors
  *    fold off that table (vocabulary-sized / n_classes-sized).
  *  - APPLY: per-doc token counts × the n_classes label list (a tiny
  *    broadcast multiplying candidate rows by L), left-joined to the
  *    model ON (word,label) — Laplace smoothing makes the miss side a
  *    closed form, so absent model rows cost coalesce(0), not a dense
  *    vocabulary scan — then one keyed aggregate per (doc,label) and a
  *    per-doc argmax window.
  *
  * Determinism contract: scores are sums of ln terms (identical IEEE
  * division both engines, ±1 ulp ln), rounded to 6 decimals BEFORE the
  * argmax, and the argmax tie-breaks on label name — so engine and
  * oracle rank identically even when two classes round to equal scores. */
object Classify {

  /** Per-document predicted label over the held-out split: trains on the
    * `splitSalt`-hashed 80% of `docs`, scores the other 20%. Returns
    * (doc_id, pred_<labelCol>, score) with `score` the rounded joint
    * log-likelihood ln P(label) + Σ c_w · ln P(word|label). */
  def naiveBayesPredict(docs: DataFrame, labelCol: String,
      splitSalt: String = "nb"): DataFrame = {
    val base = docs.select(col("doc_id"), col(labelCol).as("label"),
      Dedup.tokens(col("text")).as("toks"),
      Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "test" -> 0.2), splitSalt).as("split"))
    val train = base.where(col("split") === "train")

    // vocabulary×classes model: count(word, label) with map-side combine
    val cwl = train
      .select(col("label"), explode(col("toks")).as("word"))
      .groupBy(col("label"), col("word"))
      .agg(count(lit(1)).as("cwl"))
    val tot = cwl.groupBy(col("label"))
      .agg(sum(col("cwl")).cast("double").as("tot"))
    val vocab = cwl.agg(countDistinct(col("word")).cast("double").as("v"))
    // priors over the n_classes-row frame; the empty-partition window is
    // a whole-frame sum over n_classes rows, not a corpus window
    val pri = train.groupBy(col("label")).agg(count(lit(1)).as("nd"))
      .withColumn("lnp", log(col("nd").cast("double") /
        sum(col("nd")).over(Window.partitionBy())))
      .select(col("label"), col("lnp"))
    val labels = cwl.select(col("label")).distinct()

    val dwc = base.where(col("split") === "test")
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))

    val scored = dwc
      .crossJoin(broadcast(labels))
      .join(cwl, Seq("word", "label"), "left")
      .join(broadcast(tot), "label")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("c") *
        log((coalesce(col("cwl"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tot") + col("v")))).as("s"))
      .join(broadcast(pri), "label")
      .withColumn("score", round(col("s") + col("lnp"), 6))

    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label"))
    scored
      .withColumn("rk", row_number().over(byDoc))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("label").as(s"pred_$labelCol"),
        col("score"))
  }
}
