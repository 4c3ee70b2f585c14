package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the K-slot integer minwise-hash (MinHash)
  * signature of a shingle set (`array<string>` → `array<long>`), in ONE
  * fused pass per row.
  *
  * Replaces the K×md5-of-string formulation (slot i = lexicographic min of
  * `md5(i || '_' || shingle)`), which paid K full digest computations plus
  * a 32-char string allocation per shingle per document — the single
  * heaviest measured path in the engine (PLANS.md: 557.6 s at 10× for the
  * LSH family). Here each shingle is hashed ONCE with the engine's standard
  * double-width polynomial scheme (`h₁`: B=131 mod M=2³¹−1, `h₂`: B₂=137
  * mod M₂=2147483629 — the [[GramHashes]] pair, folded over the whole
  * variable-length shingle), and the K slot values are universal-hash
  * integer mixes of the pair:
  *
  *   slot_i = min over shingles of (a_i·h₁ + c_i·h₂ + b_i) mod P,
  *   P = 2³¹−1,  a_i = (1103515245·i + 12345) mod P,
  *   c_i = (69069·i + 1) mod P,  b_i = (40503·i + 7) mod P   (i 1-based)
  *
  * — K multiplies instead of K digests (Broder's minwise scheme with a
  * 2-component seed hash). Every intermediate stays far from Long
  * overflow: h₁,h₂ < 2³¹ and a_i,c_i < P, so each product < 2⁶² and each
  * mod-reduced 3-term sum < 3·2³¹; the same bounds hold in the DuckDB
  * oracle's BIGINT arithmetic ([[MinHashSlots.duckStringHash]] /
  * [[MinHashSlots.duckSlotValue]] replay the fold and the mix
  * bit-for-bit). a_i and c_i are verifiably nonzero mod P for all
  * supported k (checked at constant construction), so every slot mix is a
  * proper (non-degenerate) member of the family.
  *
  * An EMPTY shingle array yields an empty signature — callers must keep
  * gram-less documents out (the [[graft.dedup.Dedup.minhashSignature]]
  * guard), else every empty doc would share the empty signature exactly
  * like the old md5-of-nothing trap.
  *
  * Precondition (as [[WinnowFingerprints]]/[[GramHashes]]): shingles are
  * normalized `[a-z0-9 ]*` single-byte ASCII, so the byte fold here equals
  * the oracle's `ascii(substr(...))` character fold.
  */
case class MinHashSlots(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && k <= MinHashSlots.MaxK,
    s"k must be in [1, ${MinHashSlots.MaxK}], got $k")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSlots.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.MinHashSlots.compute($c, $k));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinHashSlots {
  /** Slot-mix modulus (= [[WinnowFingerprints.M]], the Mersenne prime
    * 2³¹−1); also the modulus of hash component h₁. */
  val P: Long = WinnowFingerprints.M

  /** Generous bound on K — far above any real banding configuration, and
    * small enough that the nonzero-coefficient check below is exhaustive. */
  val MaxK = 256

  // Universal-mix coefficient generators (classic LCG multipliers, fixed
  // so both engines spell the same literals).
  private val A0 = 1103515245L; private val A1 = 12345L
  private val C0 = 69069L; private val C1 = 1L
  private val B0 = 40503L; private val B1 = 7L

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long], Array[Long])]()

  /** (a, c, b) coefficient arrays for slots 1..k, memoized per k; a_i and
    * c_i are checked nonzero (a zero coefficient would degrade that slot
    * to a constant-plus-one-component hash). */
  private def coeffs(k: Int): (Array[Long], Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, { kk =>
      val a = new Array[Long](kk); val c = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = (A0 * (i + 1) + A1) % P
        c(i) = (C0 * (i + 1) + C1) % P
        b(i) = (B0 * (i + 1) + B1) % P
        require(a(i) != 0 && c(i) != 0, s"degenerate mix at slot ${i + 1}")
        i += 1
      }
      (a, c, b)
    })

  /** The K slot minima over the shingle array; empty input → empty array.
    * One byte-fold pair per shingle (h₁/h₂), then k mix-and-min steps —
    * no allocation beyond the k-slot result. */
  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyLongArray
    val (a, c, b) = coeffs(k)
    val slots = new Array[Long](k)
    java.util.Arrays.fill(slots, Long.MaxValue)
    val m1 = WinnowFingerprints.M
    val m2 = GramHashes.M2
    val b1 = WinnowFingerprints.B
    val b2 = GramHashes.B2
    var gi = 0
    while (gi < n) {
      val s = arr.getUTF8String(gi)
      val nb = s.numBytes()
      var h1 = 0L
      var h2 = 0L
      var j = 0
      while (j < nb) {
        val by = s.getByte(j) & 0xffL
        h1 = (h1 * b1 + by) % m1
        h2 = (h2 * b2 + by) % m2
        j += 1
      }
      var i = 0
      while (i < k) {
        val v = (a(i) * h1 % P + c(i) * h2 % P + b(i)) % P
        if (v < slots(i)) slots(i) = v
        i += 1
      }
      gi += 1
    }
    slots
  }

  /** DuckDB expression: the whole-string polynomial fold of `col` with
    * base `b` mod `m` — the oracle side of the per-shingle h₁/h₂
    * components (`(acc·b + byte) mod m` left-fold, initial 0). */
  def duckStringHash(col: String, b: Long, m: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, len($col)), " +
      s"j -> CAST(ascii(substr($col, j, 1)) AS BIGINT))), " +
      s"(acc, ch) -> (acc * $b + ch) % $m)"

  /** Convenience pair: h₁ then h₂ of `col` (B/M then B₂/M₂). */
  def duckHashPair(col: String): (String, String) =
    (duckStringHash(col, WinnowFingerprints.B, WinnowFingerprints.M),
      duckStringHash(col, GramHashes.B2, GramHashes.M2))

  /** DuckDB expression: slot value for hash-pair columns `h1`/`h2` and
    * 1-based slot index expression `i` — the oracle side of the mix. */
  def duckSlotValue(h1: String, h2: String, i: String): String =
    s"((($A0 * $i + $A1) % $P) * $h1 % $P" +
      s" + (($C0 * $i + $C1) % $P) * $h2 % $P" +
      s" + (($B0 * $i + $B1) % $P)) % $P"

  /** The expression as a Column (ColumnBridge — no session mutation). */
  def apply(k: Int)(c: Column): Column =
    ColumnBridge.column(MinHashSlots(ColumnBridge.expression(c), k))
}
