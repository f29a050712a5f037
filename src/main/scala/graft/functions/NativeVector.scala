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
  * codegen (doGenCode), reading float or double elements directly from
  * the columnar ArrayData (getter picked from the resolved child type).
  * Chosen by benchmark, per SURVEY.md §4.4: the only custom
  * Expression in the engine.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Element getters are chosen from the RESOLVED child types — an
  // array<double> input read through getFloat would silently return
  // garbage (4-byte reads against 8-byte slots), so anything that is
  // not array<float|double> is rejected at analysis time, loudly.
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"float_dot expects array<float> or array<double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects array<float|double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // a silently truncated dot on mismatched dims would produce a
    // plausible-but-wrong similarity; surface the data bug instead
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"float_dot: mismatched vector lengths $n vs ${y.numElements()}")
    val lDouble = elemType(left) == DoubleType
    val rDouble = elemType(right) == DoubleType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemType(left) == DoubleType) "getDouble" else "getFloat"
      val getB = if (elemType(right) == DoubleType) "getDouble" else "getFloat"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "float_dot: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$getA($i) * (double) $b.$getB($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED long arrays (two-pointer
  * merge, codegen'd — no hash table, no result-array allocation). The
  * workhorse of set-similarity joins: |A∩B| for Jaccard over sorted
  * distinct token hashes. Callers must pre-sort (array_sort). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash from an array of 64-bit token hashes: bit b of the
  * result is set iff Σ_tokens (2·bit_b(h)−1) > 0. The expression form
  * (one fold allocating a 32-long vote array per token via zip_with)
  * is interpreted and allocation-heavy; this is a two-level primitive
  * loop in codegen with a local int[32]. */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[32];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ((($h >>> $b) & 1L) != 0L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 32; $b++) { if ($votes[$b] > 0) $sig |= (1L << $b); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass token-class census over a string: maximal [a-z]+ runs,
  * maximal [0-9]+ runs, and characters outside [a-z0-9\s] — the exact
  * counts `regexp_count(t, '[a-z]+') / '[0-9]+' / '[^a-z0-9\s]'`
  * produce, without the three java.util.regex scans (q60 was the
  * heavy battery's largest pure-CPU cost: per-row regex is ~linear in
  * corpus bytes × passes, and this fuses the passes into one branchy
  * byte loop). Whitespace is the ASCII regex \s set (space, \t \n \x0B
  * \f \r) in BOTH java.util.regex and RE2's default — the DuckDB
  * oracle keeps the regexp form, so the gate proves the loop and the
  * three regexes agree character class by character class. Non-ASCII
  * code points (multi-byte UTF-8) match [^a-z0-9\s] in both engines:
  * counted as `other`, one per code point, and they break runs. */
case class TokenClassCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = TokenClassCounts.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_class_counts expects a string, got ${child.dataType}")
  }

  override def nullSafeEval(s: Any): Any =
    TokenClassCounts.count(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenClassCounts.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenClassCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_num", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false)))

  /** The fused loop (static so codegen and interpreted eval share it;
    * JIT compiles it once). Byte-level walk: ASCII classifies directly,
    * a multi-byte lead counts one `other` code point and skips its
    * continuation bytes. */
  def count(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = s.numBytes()
    var i = 0
    var alpha = 0L; var num = 0L; var other = 0L
    var inAlpha = false; var inNum = false
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b < 0x80) {
        if (b >= 'a' && b <= 'z') {
          if (!inAlpha) alpha += 1
          inAlpha = true; inNum = false
        } else if (b >= '0' && b <= '9') {
          if (!inNum) num += 1
          inNum = true; inAlpha = false
        } else {
          inAlpha = false; inNum = false
          if (!(b == ' ' || (b >= '\t' && b <= '\r'))) other += 1
        }
        i += 1
      } else {
        inAlpha = false; inNum = false
        other += 1
        i += (if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else 2)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](alpha, num, other))
  }
}

object NativeVector {
  val FnName = "float_dot"
  val IntersectFnName = "sorted_long_intersect"
  val SimHashFnName = "simhash32"
  val TokenClassFnName = "token_class_counts"

  /** Register once per session; then `dot`/`sortedIntersect` resolve to
    * the native expressions through the function registry. Arity is
    * checked up front so a wrong-arity SQL call fails with a message,
    * not an IndexOutOfBoundsException. */
  def register(spark: SparkSession): Unit = {
    def checked(name: String, arity: Int)(build: Seq[Expression] => Expression)
        : Seq[Expression] => Expression = exprs => {
      require(exprs.length == arity,
        s"$name takes exactly $arity argument(s), got ${exprs.length}")
      build(exprs)
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, checked(FnName, 2)(e => FloatDotProduct(e(0), e(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      IntersectFnName, checked(IntersectFnName, 2)(e => SortedLongIntersectCount(e(0), e(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SimHashFnName, checked(SimHashFnName, 1)(e => SimHash32(e.head)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomSketch.FnName, checked(BloomSketch.FnName, 2)(
        e => BloomMightContainExpr(e(0), e(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TokenClassFnName, checked(TokenClassFnName, 1)(
        e => TokenClassCounts(e.head)), "built-in")
  }

  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
  def sortedIntersect(a: Column, b: Column): Column =
    call_function(IntersectFnName, a, b)
  def simhash32(a: Column): Column = call_function(SimHashFnName, a)
  def tokenClassCounts(a: Column): Column = call_function(TokenClassFnName, a)

  /** cos(a,b) from raw float arrays: dot/(‖a‖·‖b‖), every norm evaluated
    * once per row via the native dot. THE single cosine form — Embeddings
    * (brute force, SRP-LSH) and Ivf (probe rerank) all call this, so
    * their similarity values are bit-equal by construction. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{sqrt, when}
    // zero-norm vectors → undefined cosine: null, not an ANSI
    // divide-by-zero abort of the whole query
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom > 0, dot(a, b) / denom)
  }
}
