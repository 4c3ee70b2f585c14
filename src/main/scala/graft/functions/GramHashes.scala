package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: POSITIONAL polynomial k-gram hashes of an
  * already-normalized ASCII string — element i is the hash of the gram
  * starting at byte offset i (`array<long>`, same `B`/`M` scheme and
  * therefore the same DuckDB-replayable values as
  * [[WinnowFingerprints]], which keeps only window minima).
  *
  * Computed with a rolling update — `h' = (h − s[i]·B^(k−1))·B + s[i+k]
  * mod M` — so the pass is O(n) regardless of k; exact-substring duplicate
  * detection wants k ≈ 40, where the direct per-gram sum would be 40× the
  * work. All intermediates stay far from Long overflow (h < M ≈ 2³¹,
  * h·B < 2³⁸).
  *
  * Precondition (as [[WinnowFingerprints]]): input is the
  * normalization-regex output `[a-z0-9]*`, single-byte ASCII.
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      GramHashes.compute(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.GramHashes.compute($c, $k));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GramHashes {
  import WinnowFingerprints.{B, M}

  /** Hash of every k-gram of `s` in position order; shorter-than-k inputs
    * yield an empty array. Identical values to summing
    * `byte_j · B^(k−1−j) mod M` directly (the oracle's formulation). */
  def compute(s: UTF8String, k: Int): Array[Long] = {
    val n = s.numBytes()
    val g = n - k + 1
    if (g < 1) return Array.emptyLongArray
    val pows = WinnowFingerprints.powers(k)
    val topPow = pows(k - 1)
    val h = new Array[Long](g)
    var acc = 0L
    var j = 0
    while (j < k) {
      acc += (s.getByte(j) & 0xffL) * pows(k - 1 - j)
      j += 1
    }
    acc %= M
    h(0) = acc
    var i = 1
    while (i < g) {
      val drop = (s.getByte(i - 1) & 0xffL) * topPow % M
      acc = ((acc - drop + M) * B + (s.getByte(i + k - 1) & 0xffL)) % M
      h(i) = acc
      i += 1
    }
    h
  }

  /** Registers (idempotently) and returns the expression as a Column. */
  def apply(spark: SparkSession, k: Int)(c: Column): Column = {
    val name = s"graft_gram_hashes_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => GramHashes(exprs.head, k), "built-in")
    org.apache.spark.sql.functions.call_function(name, c)
  }
}
