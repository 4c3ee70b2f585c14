package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two equal-length
  * strings (differing character positions), with whole-stage codegen.
  *
  * Replaces the interpreted formulation `aggregate(transform(sequence(1, n),
  * j -> substr ≠ substr))` used on SimHash fingerprints, which allocates a
  * lambda frame and two single-char UTF8String slices per bit — on a
  * candidate-pair join (q44: ~10⁶ pairs × 16 bits at sf0.1) that is the hot
  * inner loop. Here it's one byte-compare pass over the backing bytes
  * (fingerprints are ASCII '0'/'1', so byte == character).
  *
  * Extra positions of the longer string count as differences, matching the
  * transform-over-max-length semantics only for equal lengths — fingerprint
  * comparisons always have equal lengths.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[UTF8String].getBytes
    val ys = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(xs.length, ys.length)
    var d = math.max(xs.length, ys.length) - n
    var i = 0
    while (i < n) {
      if (xs(i) != ys(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |byte[] $xs = $a.getBytes();
         |byte[] $ys = $b.getBytes();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |int $d = java.lang.Math.max($xs.length, $ys.length) - $n;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs[$i] != $ys[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object HammingDistance {
  /** The expression as a Column — built directly (ColumnBridge), no
    * session mutation; SQL users get the function via GraftExtensions. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
