package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point for the engine's native functions —
  * lets pure-SQL users get them without touching the Scala API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql.extensions=graft.functions.GraftExtensions
  *   spark.sql("SELECT graft_cosine_similarity(a.e, b.e) FROM ...")
  *
  * Int parameters (k, w) must be integer literals in SQL:
  * `graft_winnow_fingerprints(norm_text, 8, 4)`.
  *
  * (The DataFrame path builds Columns directly from the expressions —
  * no session mutation; this class is the spark-submit-time hook for the
  * SQL names. `BloomMightContain` is deliberately NOT injected: it closes
  * over a driver-built BloomFilter object, which has no SQL literal
  * form.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(exprs: Seq[Expression], n: Int, fn: String): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${exprs.length}")

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private[functions] def buildWinnow(exprs: Seq[Expression]): Expression = {
    arity(exprs, 3, "graft_winnow_fingerprints")
    WinnowFingerprints(exprs(0), intArg(exprs(1), "k"), intArg(exprs(2), "w"))
  }

  private[functions] def buildGramHashes(exprs: Seq[Expression]): Expression = {
    arity(exprs, 2, "graft_gram_hashes")
    GramHashes(exprs(0), intArg(exprs(1), "k"))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    inject("graft_cosine_similarity", classOf[CosineSimilarity],
      exprs => {
        arity(exprs, 2, "graft_cosine_similarity")
        CosineSimilarity(exprs(0), exprs(1))
      })
    inject("graft_hamming_distance", classOf[HammingDistance],
      exprs => {
        arity(exprs, 2, "graft_hamming_distance")
        HammingDistance(exprs(0), exprs(1))
      })
    inject("graft_jaro_winkler", classOf[JaroWinkler],
      exprs => {
        arity(exprs, 2, "graft_jaro_winkler")
        JaroWinkler(exprs(0), exprs(1))
      })
    inject("graft_dot_product", classOf[DotProduct],
      exprs => {
        arity(exprs, 2, "graft_dot_product")
        DotProduct(exprs(0), exprs(1))
      })
    inject("graft_winnow_fingerprints", classOf[WinnowFingerprints],
      buildWinnow)
    inject("graft_gram_hashes", classOf[GramHashes], buildGramHashes)
    // Statistics-driven broadcast planning (graft.plans.StatsBroadcastRule):
    // a strict no-op until TableStats carries collected statistics, then
    // adds BROADCAST hints to joins whose filtered side the stats estimate
    // under the threshold — see the rule's scaladoc.
    e.injectOptimizerRule(sp => graft.plans.StatsBroadcastRule(sp))
  }
}
