package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point for the engine's native functions —
  * lets pure-SQL users get them without touching the Scala API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql.extensions=graft.functions.GraftExtensions
  *   spark.sql("SELECT graft_cosine_similarity(a.e, b.e) FROM ...")
  *
  * (The DataFrame path registers the same expression lazily via
  * [[CosineSimilarity.apply]]; this class is the spark-submit-time hook.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "graft_cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName,
        "graft_hamming_distance"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance(exprs(0), exprs(1))))
  }
}
