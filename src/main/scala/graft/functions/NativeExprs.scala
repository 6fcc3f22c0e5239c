package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hottest inner loops. Both are
  * drop-in replacements for higher-order-function folds with IDENTICAL
  * results (same accumulation order, same casts), but codegen'd into a
  * tight scalar loop instead of per-element interpreted lambda dispatch
  * (SURVEY.md §7.3: custom `Expression` preferred over HOFs on hot
  * paths). Oracle SQL twins are unchanged — the driver's DuckDB compare
  * is the equivalence proof.
  */

/** Polynomial rolling hash over a string's code points:
  * `acc_i = (acc_{i-1} * mul + codepoint_i) % mod`, seed 0.
  * Exact equivalent of the HOF form
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substring(s, i, 1))), 0L, (a, c) -> (a*mul + c) % mod)`
  * — `ascii(substring(s, i, 1))` is the i-th code point. */
case class PolyHash(child: Expression, mul: Long, mod: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"PolyHash needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val js = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < js.length) {
      val cp = js.codePointAt(i)
      acc = (acc * mul + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName for EVERY local: this expression can occur many times in
      // one generated function (e.g. one per minhash permutation), and a
      // fixed name is a Janino "Redefinition of local variable" compile
      // error → silent interpreted fallback for the whole projection
      val js = ctx.freshName("phStr")
      val acc = ctx.freshName("phAcc")
      val i = ctx.freshName("phI")
      val cp = ctx.freshName("phCp")
      s"""
         |java.lang.String $js = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $js.length()) {
         |  int $cp = $js.codePointAt($i);
         |  $acc = ($acc * ${mul}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

/** Dot product of two FLOAT array columns accumulated in double, index
  * order — the exact fold of
  * `aggregate(transform(sequence(1, n), i -> double(a[i]) * double(b[i])), 0.0d, (acc, x) -> acc + x)`
  * for equal-length arrays. Mismatched lengths yield NULL (the HOF form
  * nulls via out-of-range element_at). */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloatArray(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatVecDot needs ARRAY<FLOAT> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — one FloatVecDot per hyperplane/probe
      // lands in the same generated function; fixed names fail to compile
      val acc = ctx.freshName("dotAcc")
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** Dot product of a FLOAT array column with a DOUBLE array (typically a
  * literal hyperplane/centroid), accumulated in double, index order —
  * the exact fold of
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * y), 0.0d, (acc, x) -> acc + x)`
  * for equal-length arrays (mismatched lengths yield NULL, matching
  * zip_with's null padding poisoning the sum). The HOF form this
  * replaces is interpreted per element; with planes × tables × dims
  * that lambda dispatch dominates the ANN scans. */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"FloatDoubleVecDot needs ARRAY<FLOAT>, ARRAY<DOUBLE>, got $l / $r")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — one instance per plane/centroid lands
      // in the same generated function (see PolyHash note)
      val acc = ctx.freshName("fdDotAcc")
      val n = ctx.freshName("fdDotN")
      val i = ctx.freshName("fdDotI")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDoubleVecDot =
    copy(left = l, right = r)
}

/** Dot product of two INT array columns accumulated as LONG, index
  * order — the exact fold of
  * `aggregate(zip_with(a, b, (x, y) -> bigint(x) * bigint(y)), 0L, (acc, x) -> acc + x)`
  * for equal-length arrays (mismatched lengths → NULL). Pure integer
  * arithmetic: bit-identical in any engine and overflow-free for
  * quantized int8 components (127² · dim ≪ 2^63) — the scoring kernel
  * of the SQ8 quantized ANN scan. */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isIntArray(t: DataType) = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntArray(left.dataType) && isIntArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"IntVecDot needs ARRAY<INT> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        acc += x.getInt(i).toLong * y.getInt(i).toLong
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local (see PolyHash note)
      val acc = ctx.freshName("iDotAcc")
      val n = ctx.freshName("iDotN")
      val i = ctx.freshName("iDotI")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntVecDot =
    copy(left = l, right = r)
}

/** Pack an INT array into a BINARY of the same length, one byte per
  * element (caller guarantees values fit a signed byte — the SQ8
  * quantizer clamps to ±127). This is what makes an SQ8 index table
  * genuinely 1 byte/component on disk and in shuffle buffers: an
  * ARRAY<INT> column stores 4 bytes per component plus array overhead,
  * which forfeits the whole point of int8 quantization. */
case class PackInt8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"PackInt8 needs ARRAY<INT>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = x.getInt(i).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("pkN")
      val i = ctx.freshName("pkI")
      val out = ctx.freshName("pkOut")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) $a.getInt($i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PackInt8 =
    copy(child = c)
}

/** Dot product of two BINARY columns as signed int8 vectors, accumulated
  * as LONG in index order (mismatched lengths → NULL) — the scoring
  * kernel over [[PackInt8]]-packed SQ8 codes. Bytes sign-extend, so the
  * sum equals [[IntVecDot]] over the unpacked int arrays exactly; pure
  * integer arithmetic, bit-identical in any engine. */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ByteVecDot needs BINARY inputs, got $l / $r")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null
    else {
      var acc = 0L
      var i = 0
      while (i < x.length) { acc += x(i).toLong * y(i).toLong; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("bDotAcc")
      val i = ctx.freshName("bDotI")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ByteVecDot =
    copy(left = l, right = r)
}

object NativeExprs {
  def polyHash(c: Column, mul: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mul, mod))
  def floatVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def floatDoubleVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDoubleVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def intVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def packInt8(a: Column): Column =
    ColumnBridge.column(PackInt8(ColumnBridge.expression(a)))
  def byteVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ByteVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
