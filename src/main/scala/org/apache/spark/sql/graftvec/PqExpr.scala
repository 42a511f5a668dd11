package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd product-quantization kernels. The HOF compositions
  * (m·ksub zip_with+aggregate distance trees per row) define the
  * semantics and the DuckDB oracles; these run the hot paths — PQ
  * encoding and ADC scoring are per-row work on EVERY corpus row, the
  * exact place interpreted lambda dispatch hurts at scale. Pinned
  * value-identical to the HOF forms by PqEquivalenceSpec: same
  * ascending-position left-fold (d² accumulation), same strict-<
  * argmin (ties to the smaller cell id, the struct-min rule), same
  * subspace-ascending ADC sum.
  *
  * Codebooks travel as one flat double[] reference object — not a
  * thousand-literal expression tree.
  */
case class PqCells(child: Expression, cents: Seq[Double],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.length == m * ksub * dsub, "codebook shape mismatch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_cells"

  @transient private lazy val flat = cents.toArray

  override protected def nullSafeEval(input: Any): Any =
    PqExpr.assign(input.asInstanceOf[ArrayData], flat, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftvec.PqExpr.assign($a, $ref, $m, $ksub, $dsub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PqAdcDist(left: Expression, right: Expression, cents: Seq[Double],
    m: Int, ksub: Int, dsub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(cents.length == m * ksub * dsub, "codebook shape mismatch")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dist"

  @transient private lazy val flat = cents.toArray

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqExpr.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      flat, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = org.apache.spark.sql.graftvec.PqExpr.adc($q, $c, $ref, $m, $ksub, $dsub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExpr {

  /** Squared L2 between subspace `mi` of `v` and centroid `cid`, the
    * HOF fold order: positions ascending, acc += d·d.
    */
  private def subDist(v: ArrayData, cents: Array[Double],
      mi: Int, cid: Int, ksub: Int, dsub: Int): Double = {
    val base = (mi * ksub + cid) * dsub
    val off = mi * dsub
    var acc = 0.0
    var p = 0
    while (p < dsub) {
      val d = v.getFloat(off + p).toDouble - cents(base + p)
      acc += d * d
      p += 1
    }
    acc
  }

  /** A vector shorter than m·dsub would otherwise yield partial
    * distances and plausible-looking-but-wrong codes; surface the
    * malformed input instead of quantizing it.
    */
  private def checkShape(v: ArrayData, m: Int, dsub: Int): Unit = {
    val n = v.numElements()
    if (n != m * dsub)
      throw new IllegalArgumentException(
        s"pq: vector length $n != m*dsub = ${m * dsub}")
  }

  /** All-subspace argmin cells (strict < keeps the smaller cid on ties
    * — the struct-min rule).
    */
  def assign(v: ArrayData, cents: Array[Double],
      m: Int, ksub: Int, dsub: Int): ArrayData = {
    checkShape(v, m, dsub)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = subDist(v, cents, mi, 0, ksub, dsub)
      var cid = 1
      while (cid < ksub) {
        val d = subDist(v, cents, mi, cid, ksub, dsub)
        if (d < bestD) { bestD = d; best = cid }
        cid += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: subspace-ascending sum of the code-named centroid
    * distances (the HOF reduce(_ + _) association).
    */
  def adc(q: ArrayData, codes: ArrayData, cents: Array[Double],
      m: Int, ksub: Int, dsub: Int): Double = {
    checkShape(q, m, dsub)
    var total = 0.0
    var mi = 0
    while (mi < m) {
      total += subDist(q, cents, mi, codes.getInt(mi), ksub, dsub)
      mi += 1
    }
    total
  }

  def cells(vec: Column, cents: Seq[Double], m: Int, ksub: Int, dsub: Int): Column =
    ExpressionUtils.column(
      PqCells(ExpressionUtils.expression(vec), cents, m, ksub, dsub))

  def adcDist(qvec: Column, codes: Column, cents: Seq[Double],
      m: Int, ksub: Int, dsub: Int): Column =
    ExpressionUtils.column(PqAdcDist(
      ExpressionUtils.expression(qvec), ExpressionUtils.expression(codes),
      cents, m, ksub, dsub))
}
