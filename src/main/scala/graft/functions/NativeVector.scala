package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for float-vector dot product.
  *
  * The built-in route (`aggregate(zip_with(...))`) allocates an
  * intermediate array and evaluates lambdas interpreted — fine for
  * occasional use, hot-loop-hostile for kNN over millions of pairs. This
  * expression generates a tight primitive loop inside whole-stage
  * codegen (doGenCode), reading floats directly from the columnar
  * ArrayData. Chosen by benchmark, per SURVEY.md §4.4: the only custom
  * Expression in the engine.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers pass array<float> columns (see Embeddings); no public SQL
  // surface, so input typing is enforced by the callers' schemas
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeVector {
  val FnName = "float_dot"

  /** Register once per session; then `dot(a, b)` resolves to the native
    * expression through the function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")

  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
