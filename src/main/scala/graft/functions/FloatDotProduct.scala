package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float vectors as double.
  *
  * The one place (SURVEY.md §4.2/§7.3) where a custom `Expression` pays off:
  * embedding similarity evaluates this kernel O(n·k) times, and a
  * higher-order-function formulation (`aggregate(zip_with(...))`) allocates
  * a lambda frame per element. This version is a tight primitive loop in
  * both interpreted (`nullSafeEval`) and whole-stage-codegen (`doGenCode`)
  * paths, composing with Catalyst (pruning/pushdown/codegen) — unlike a
  * `mapPartitions` kernel, it stays inside the optimizer's reach.
  *
  * Arithmetic contract: ascending-index fold of `double(x_i) * double(y_i)`
  * — element-order identical to the HOF formulation and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(..)))`, so results are bit-equal and
  * hash-parity is preserved.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_f requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Register `dot_f(a, b)` on the session (idempotent) so both the ops
    * layer (`expr("dot_f(..)")`) and engine-generated SQL can use it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")
}
