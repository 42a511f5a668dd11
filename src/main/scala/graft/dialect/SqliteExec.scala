package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, EvalMode, Expression, IntegralDivide}
import org.apache.spark.sql.graftvec.PlanBridge
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** sqlite-strict execution front door (SURVEY §7.4#2 — the dialect gap
  * the reference papers over with per-dialect LLM repair prompts,
  * `sql_debug.py:120-250`): lexical transpile (`transpileSqlite`, which
  * also resolves sqlite's double-quoted string-literal fallback) plus
  * the one semantic gap a lexical rewriter cannot close —
  * **integer division**. sqlite's `int / int` truncates; Spark's `/`
  * always divides as double. No token rewrite can decide this (it
  * depends on the OPERAND TYPES), so it is applied as a type-aware
  * rewrite on the ANALYZED logical plan: `Divide` whose operands are
  * integral (the analyzer shows them as integral-to-double casts)
  * becomes `IntegralDivide`. `EvalMode.LEGACY` mirrors sqlite's
  * divide-by-zero → NULL (ANSI would throw).
  */
object SqliteExec {

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The integral expression under an analyzer-inserted to-double cast
    * (Divide only accepts fractional inputs, so `sum(x)/count(*)`
    * analyzes as `Divide(cast(sum AS double), cast(count AS double))`).
    *
    * Only ANALYZER-inserted casts are looked through: a user-written
    * `CAST(x AS REAL)` (tagged `Cast.USER_SPECIFIED_CAST` by the
    * parser; the transpiler rewrites REAL→DOUBLE but the tag survives)
    * is sqlite's idiom for *forcing* float division — stripping it
    * would truncate, the opposite of sqlite semantics.
    */
  private def integralSource(e: Expression): Option[Expression] = e match {
    case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
        c.dataType == DoubleType && integral(c.child.dataType) =>
      Some(c.child)
    case _ if integral(e.dataType) => Some(e)
    case _ => None
  }

  /** Parse + transpile + execute `sqliteSql` with sqlite semantics.
    * `identifiers` (table/column names, case-insensitive) feed the
    * double-quoted fallback: a known name stays an identifier, anything
    * else becomes a string literal — exactly sqlite's resolution rule.
    */
  def sql(spark: SparkSession, sqliteSql: String,
      identifiers: Set[String] = Set.empty): DataFrame = {
    val df = spark.sql(Transpiler.transpileSqlite(sqliteSql, identifiers))
    val fixed = df.queryExecution.analyzed.transformAllExpressions {
      case Divide(l, r, _) if integralSource(l).isDefined && integralSource(r).isDefined =>
        IntegralDivide(integralSource(l).get, integralSource(r).get, EvalMode.LEGACY)
    }
    PlanBridge.ofRows(spark, fixed)
  }
}
