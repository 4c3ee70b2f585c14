package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: POSITIONAL polynomial k-gram hashes of an
  * already-normalized ASCII string — element i is the hash of the gram
  * starting at byte offset i (`array<long>`).
  *
  * The value is a DOUBLE-WIDTH hash: two independent polynomial hashes
  * (`B=131 mod M=2³¹−1` — the [[WinnowFingerprints]] scheme — and
  * `B₂=137 mod M₂=2147483629`) packed as `h₁·M₂ + h₂` (< 2⁶², exact in
  * a BIGINT). Width matters because this feeds EXACT-substring duplicate
  * detection ([[graft.dedup.Dedup.dupSpans]]), where hash equality IS the
  * duplication verdict: with D distinct grams corpus-wide, a single
  * 31-bit hash false-marks ~D/2³¹ of grams — at 10⁹ grams a third of the
  * corpus reads as "duplicated", and at 100 TB essentially all of it.
  * At 62 bits the false-mark rate is D/2⁶² (~10⁻⁶ at 10¹² grams) —
  * negligible, and the winnowing SKETCH family (which tolerates
  * collisions by design and verifies downstream) keeps the narrow hash.
  *
  * Computed with rolling updates — `h' = (h − s[i]·B^(k−1))·B + s[i+k]
  * mod M` per component — so the pass is O(n) regardless of k;
  * exact-substring detection wants k ≈ 40, where the direct per-gram sum
  * would be 40× the work. All intermediates stay far from Long overflow
  * (h < M ≈ 2³¹, h·B < 2³⁹, h₁·M₂ < 2⁶²).
  *
  * Precondition (as [[WinnowFingerprints]]): input is the
  * normalization-regex output `[a-z0-9]*`, single-byte ASCII.
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")

  override def inputTypes = Seq(StringType)
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

  /** Second, independent hash component (different base AND modulus —
    * both primes, so the pair collides only when both components do). */
  val B2 = 137L
  val M2 = 2147483629L // the largest prime below 2^31 - 1

  private val powers2Cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** B2^t mod M2 for t in [0, k) — memoized per k (see
    * [[WinnowFingerprints.powers]]). */
  def powers2(k: Int): Array[Long] = powers2Cache.computeIfAbsent(k, { kk =>
    val p = new Array[Long](kk)
    p(0) = 1L
    for (t <- 1 until kk) p(t) = p(t - 1) * B2 % M2
    p
  })

  /** Double-width hash of every k-gram of `s` in position order;
    * shorter-than-k inputs yield an empty array. Each component is
    * identical to summing `byte_j · B^(k−1−j) mod M` directly (the
    * oracle's formulation); the packed value is `h₁·M₂ + h₂`. */
  def compute(s: UTF8String, k: Int): Array[Long] = {
    val n = s.numBytes()
    val g = n - k + 1
    if (g < 1) return Array.emptyLongArray
    val pows1 = WinnowFingerprints.powers(k)
    val pows2v = powers2(k)
    val top1 = pows1(k - 1)
    val top2 = pows2v(k - 1)
    val h = new Array[Long](g)
    var a1 = 0L
    var a2 = 0L
    var j = 0
    while (j < k) {
      val b = s.getByte(j) & 0xffL
      a1 += b * pows1(k - 1 - j)
      a2 += b * pows2v(k - 1 - j)
      j += 1
    }
    a1 %= M
    a2 %= M2
    h(0) = a1 * M2 + a2
    var i = 1
    while (i < g) {
      val bOut = s.getByte(i - 1) & 0xffL
      val bIn = s.getByte(i + k - 1) & 0xffL
      a1 = ((a1 - bOut * top1 % M + M) * B + bIn) % M
      a2 = ((a2 - bOut * top2 % M2 + M2) * B2 + bIn) % M2
      h(i) = a1 * M2 + a2
      i += 1
    }
    h
  }

  /** SQL fragment computing the same packed double hash for the gram at
    * 1-based position `i` of column `col` — the DuckDB oracle side of
    * [[compute]]. */
  def duckGramHashWide(col: String, i: String, k: Int): String = {
    val h1 = WinnowFingerprints.duckGramHash(col, i, k)
    val pows2v = powers2(k)
    val h2 = (0 until k).map(j =>
      s"CAST(ascii(substr($col, $i + $j, 1)) AS BIGINT) * ${pows2v(k - 1 - j)}")
      .mkString("(", " + ", s") % $M2")
    s"(($h1) * $M2 + ($h2))"
  }

  /** The expression as a Column — built directly (ColumnBridge), no
    * session mutation; SQL users get the function via GraftExtensions. */
  def apply(k: Int)(c: Column): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(c), k))
}
