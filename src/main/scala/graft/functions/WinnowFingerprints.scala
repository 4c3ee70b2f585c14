package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing (MOSS) fingerprints of an
  * already-normalized ASCII string, in ONE fused pass — polynomial k-gram
  * hashes, sliding-window minima, distinct, sort. Output is the sorted
  * array of window-min hashes (`array<long>`).
  *
  * Replaces the md5-per-k-gram higher-order-function formulation, which
  * paid an interpreted lambda frame plus a 32-char digest-string
  * allocation per character position — the dominant cost of q63/q64.
  * The polynomial hash is plain integer arithmetic
  * (`Σ byte_j · B^(k-1-j) mod M`, B=131, M=2^31−1, per-term powers
  * pre-reduced mod M so the 8-term sum stays far from overflow), which the
  * DuckDB oracle reproduces bit-for-bit with BIGINT math — no digest
  * function in either engine's hot path. Winnowing needs only SOME total
  * order on hashes; numeric min replaces the previous lexicographic-md5
  * min (both are valid MOSS schemes).
  *
  * Precondition: the input is the normalization-regex output `[a-z0-9]*`
  * (single-byte ASCII), so byte offsets are character offsets and
  * `ascii()` in the oracle equals the byte value here.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  // validated at construction (= analysis time for SQL callers) — invalid
  // sizes would otherwise throw Array exceptions inside every executor task
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(
         |    graft.functions.WinnowFingerprints.compute($c, $k, $w));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WinnowFingerprints {
  val B = 131L
  val M = 2147483647L // 2^31 - 1

  private val powersCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** B^t mod M for t in [0, k) — memoized per k: compute() sits on the
    * per-ROW hot path of q63/q64/q74/q90, and rebuilding the table per
    * invocation is 2k redundant modular multiplies plus an allocation per
    * row. Entries are read-only after construction. */
  def powers(k: Int): Array[Long] = powersCache.computeIfAbsent(k, { kk =>
    val p = new Array[Long](kk)
    p(0) = 1L
    for (t <- 1 until kk) p(t) = p(t - 1) * B % M
    p
  })

  /** Sorted distinct minima of each w-window over the k-gram hashes of
    * `s`. Shorter-than-(k+w-1) inputs yield an empty array. */
  def compute(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val n = s.numBytes()
    val g = n - k + 1
    val nw = g - w + 1
    if (nw < 1) return Array.emptyLongArray
    val pows = powers(k)
    val h = new Array[Long](g)
    var i = 0
    while (i < g) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc += (s.getByte(i + j) & 0xffL) * pows(k - 1 - j)
        j += 1
      }
      h(i) = acc % M
      i += 1
    }
    val mins = new Array[Long](nw)
    var t = 0
    while (t < nw) {
      var m = h(t)
      var j = 1
      while (j < w) {
        if (h(t + j) < m) m = h(t + j)
        j += 1
      }
      mins(t) = m
      t += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    var r = 1
    while (r < nw) {
      if (mins(r) != mins(out - 1)) { mins(out) = mins(r); out += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(mins, out)
  }

  /** SQL fragment computing the same hash for the gram at 1-based position
    * `i` of column `col` — the DuckDB oracle side of [[compute]]. */
  def duckGramHash(col: String, i: String, k: Int): String = {
    val pows = powers(k)
    // the BIGINT cast matters: DuckDB's ascii() is INT32 and the product
    // with a ~2^31 power overflows before any promotion
    (0 until k).map(j =>
      s"CAST(ascii(substr($col, $i + $j, 1)) AS BIGINT) * ${pows(k - 1 - j)}")
      .mkString("(", " + ", s") % $M")
  }

  /** The expression as a Column — built directly (ColumnBridge), no
    * session mutation; SQL users get the function via GraftExtensions. */
  def apply(k: Int, w: Int)(c: Column): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}
