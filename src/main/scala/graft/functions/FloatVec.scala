package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftvec.FloatVecExpr

/** Fast-path vector ops backed by the codegen'd `FloatDotProduct`
  * expression (see `org.apache.spark.sql.graftvec.FloatVecExpr`).
  * Strict `array<float>` inputs — no implicit casts; use
  * `VectorOps.dot` for mixed/literal-double inputs. Both paths share
  * the identical left-fold arithmetic, so they are interchangeable
  * without changing any score bit.
  */
object FloatVec {

  def dotF(a: Column, b: Column): Column = FloatVecExpr.dot(a, b)

  def normF(a: Column): Column = sqrt(dotF(a, a))
}
