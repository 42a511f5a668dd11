package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Codegen'd shingle hasher: given a token array and window size n,
  * emits one polynomial hash per n-gram window —
  * `acc = (acc*31 + char) % (1e9+7)` over the characters of
  * `concat_ws(" ", tok_i..tok_{i+n-1})`, without materializing the
  * shingle strings.
  *
  * Value-identical to `TextAnalysis.polyHash(concat_ws(" ", window))`
  * (and to the DuckDB oracle's list_reduce mirror): the space joiner is
  * folded in as char 32 between tokens. Replaces a 4-deep interpreted
  * HOF chain (sequence→slice→concat_ws→aggregate-per-char) with one
  * tight loop — the hot path of MinHash/SimHash/Jaccard dedup at scale.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = math.max(m - n + 1, 0)
    val out = new Array[Long](cnt)
    val toks = Array.tabulate(m)(i => arr.getUTF8String(i).toString)
    var i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * 31 + 32) % 1000000007L
        val t = toks(i + j)
        // CODE POINTS — the pinned polyHash reference iterates
        // split("")/ascii, i.e. code points; a charAt walk would
        // hash astral chars as two surrogates and diverge
        var k = 0
        while (k < t.length) {
          val cp = t.codePointAt(k)
          acc = (acc * 31 + cp) % 1000000007L
          k += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |int $m = $a.numElements();
         |int $cnt = java.lang.Math.max($m - $n + 1, 0);
         |long[] $out = new long[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($j > 0) $acc = ($acc * 31 + 32) % 1000000007L;
         |    String $t = $a.getUTF8String($i + $j).toString();
         |    for (int $k = 0; $k < $t.length(); ) {
         |      int ${k}cp = $t.codePointAt($k);
         |      $acc = ($acc * 31 + ${k}cp) % 1000000007L;
         |      $k += java.lang.Character.charCount(${k}cp);
         |    }
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd MinHash signature: for each affine permutation (a_i, b_i),
  * the min of (a_i*x + b_i) % (1e9+7) over the input hash array — one
  * fused loop instead of h interpreted transform+array_min chains.
  */
case class MinHashSignature(child: Expression, coeffsA: Seq[Long], coeffsB: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(coeffsA.length == coeffsB.length && coeffsA.nonEmpty)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val h = coeffsA.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = Array.fill(h)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = arr.getLong(i)
      var q = 0
      while (q < h) {
        val v = (coeffsA(q) * x + coeffsB(q)) % 1000000007L
        if (v < out(q)) out(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      val caInit = ctx.addMutableState("long[]", ca,
        vn => s"$vn = new long[]{${coeffsA.mkString("L,")}L};", forceInline = true)
      val cbInit = ctx.addMutableState("long[]", cb,
        vn => s"$vn = new long[]{${coeffsB.mkString("L,")}L};", forceInline = true)
      s"""
         |int $m = $a.numElements();
         |long[] $out = new long[$h];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $m; $i++) {
         |  long $x = $a.getLong($i);
         |  for (int $q = 0; $q < $h; $q++) {
         |    long $v = ($caInit[$q] * $x + $cbInit[$q]) % 1000000007L;
         |    if ($v < $out[$q]) $out[$q] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd char-entropy weighted log-sum: sort the chars, scan the
  * runs, emit `Σ cnt·floor(1e6·ln cnt)` — one primitive char[] sort +
  * one pass, zero allocation beyond the copy. Value-identical (pinned
  * by HashEquivalenceSpec) to the HOF definition
  * `TextAnalysis.charEntropySumHof` (an aggregate() struct fold whose
  * per-element InternalRow allocation made it GC-bound at the 100×
  * sweep), and to the DuckDB oracle's runs CTE: counts are a multiset,
  * so ANY total char order produces the same sum — UTF-16 unit sort
  * here, byte-order string sort there, same integers out.
  */
case class CharEntropySum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    CharEntropySum.sumOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = org.apache.spark.sql.graftvec.CharEntropySum.sumOf($a.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropySum {
  /** Shared by eval and generated code (one tight loop, two callers).
    * Counts CODE POINTS, not UTF-16 units: Spark's split("")/length()
    * (the HOF definition and the gate's L) and DuckDB's string_split
    * are all code-point based, so a surrogate pair must be ONE
    * character here too or the three definitions diverge on
    * supplementary-plane text.
    */
  def sumOf(s: String): Long = {
    if (s.isEmpty) return 0L
    val a = s.codePoints().toArray
    java.util.Arrays.sort(a)
    var sum = 0L
    var run = 1L
    var i = 1
    while (i <= a.length) {
      if (i < a.length && a(i) == a(i - 1)) run += 1
      else {
        sum += run * math.floor(1e6 * math.log(run.toDouble)).toLong
        run = 1
      }
      i += 1
    }
    sum
  }
}

/** Codegen'd full-string polynomial hash —
  * `fold(acc = (acc*31 + codePoint) % 1e9+7)` over the string's code
  * points: the scalar under document fingerprinting (exact dedup's
  * shuffle key) and line hashing (corpus line dedup). Value-identical
  * (pinned by HashEquivalenceSpec) to the HOF definition
  * `TextAnalysis.polyHashHof` — a split-per-char transform+aggregate
  * chain that allocates one array element per CHARACTER — and to the
  * DuckDB oracles' list_reduce mirror. One tight loop, zero
  * allocation.
  */
case class StringPolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    StringPolyHash.hashOf(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = org.apache.spark.sql.graftvec.StringPolyHash.hashOf($a.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringPolyHash {
  /** Shared by eval and generated code. CODE POINTS, not UTF-16 units —
    * the pinned HOF reference iterates split("")/ascii, i.e. code
    * points; hashing surrogate halves would diverge on astral text.
    */
  def hashOf(s: String): Long = {
    var acc = 0L
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      acc = (acc * 31 + cp) % 1000000007L
      k += Character.charCount(cp)
    }
    acc
  }
}

object TextHashExpr {
  def shingleHashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))

  def stringPolyHash(text: Column): Column =
    ExpressionUtils.column(StringPolyHash(ExpressionUtils.expression(text)))

  def minhashSignature(hashes: Column, coeffs: Seq[(Long, Long)]): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(hashes), coeffs.map(_._1), coeffs.map(_._2)))

  def charEntropySum(text: Column): Column =
    ExpressionUtils.column(CharEntropySum(ExpressionUtils.expression(text)))
}
