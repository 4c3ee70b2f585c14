package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] against a long hash
  * column — the codegen'd equivalent of the SQL-internal `might_contain`
  * (which Spark does not register for user queries), without a Scala UDF
  * in the hot path.
  *
  * The filter rides along as a task reference object (it is
  * `Serializable`; ~1.2 MB at fpp 0.01 for 10⁶ elements — the same class
  * of driver-held small side as broadcast dimension tables and k×dim
  * centroid literals). Probes are a handful of XOR/mask reads per row —
  * no join, no shuffle, no per-row allocation.
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BloomMightContain {
  /** The probe as a Column over a LongType hash column. Built directly
    * from the expression — NOT via the temp-function registry the
    * stateless graft expressions use: this expression closes over a
    * per-call value (the filter), so registry binding would either leak
    * one multi-MB filter per call under per-instance names, or (fixed
    * name) resolve a Column against whichever filter registered last. */
  def apply(bf: BloomFilter)(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bf))
  }
}
