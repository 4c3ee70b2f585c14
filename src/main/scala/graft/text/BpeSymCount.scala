package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluator for [[Bpe.encode]]'s DEEP-merge-table regime: the BPE
  * symbol count of one word under a learned merge table, applied in
  * learned order with leftmost non-overlapping passes
  * ([[Bpe.symbolCount]] — bit-identical to the shallow replace-fold,
  * which BpeSpec pins). The merge table rides in the expression as a
  * closure value (the [[graft.functions.BloomMightContain]] pattern —
  * per-call state can't go through the function registry), so a 32k-row
  * tokenizer costs a constant-size plan node instead of a 32k-deep
  * expression tree. CodegenFallback: the per-row work is the merge loop
  * itself; codegen could only inline the dispatch around it. */
case class BpeSymCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bpe.symbolCount(input.asInstanceOf[UTF8String].toString, merges)

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BpeSymCount {
  def apply(merges: Seq[(String, String)])(c: Column): Column =
    ColumnBridge.column(BpeSymCount(ColumnBridge.expression(c), merges))
}
