package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * The generic HOF composition (`zip_with` + `aggregate`) is evaluated
  * through interpreted lambdas — fine once per row, dominant cost when
  * a similarity join computes one dot per candidate pair. This compiles
  * to a tight primitive loop inside whole-stage codegen: no lambda
  * dispatch, no intermediate array.
  *
  * Numeric contract: identical left-fold double accumulation as the HOF
  * path (acc += (double)x[i] * (double)y[i], i ascending), so scores are
  * bit-identical to it and to the DuckDB oracle mirror.
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes /
  * ExpressionUtils are private[sql]; this is the documented pattern for
  * native expression extensions.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatVecExpr {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
