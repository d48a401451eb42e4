package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expression for vector dot products.
  *
  * The higher-order-function route (`aggregate(zip_with(...))`) is
  * interpreted (CodegenFallback) — measured ~30x slower on all-pairs
  * similarity at sf0.1. This expression generates a tight primitive loop
  * inside whole-stage codegen: no virtual calls, no boxing, no lambda
  * dispatch per element. Inputs are `array<double>`; see
  * VectorFns.unitVector for the one-off normalization pass.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // a LENGTH MISMATCH or any NULL ELEMENT yields NULL — loud-by-null
  // rather than a silently truncated/garbage partial sum, and exactly
  // the value the HOF formulation produces (zip_with pads ragged arrays
  // with null, a null element nulls its product, and the sum absorbs
  // null), which is what lets HofDotRewrite substitute this expression
  // without changing any query's semantics. The per-element null branch
  // costs nothing on the hot paths: their arrays never contain nulls,
  // so the branch is perfectly predicted.
  override def nullable: Boolean = true

  // inputs MUST be array<double>: eval/codegen read 8-byte strides, so a
  // mis-typed array would be silently misread as garbage, not error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<double> inputs, got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

object ArrayDot {
  def apply(a: Column, b: Column): Column =
    Bridge.column(ArrayDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Int8 scalar quantization of a double vector: code_i =
  * round(v_i / scale * 127) clamped to [-127, 127], emitted as BINARY —
  * one byte per dimension, an 8x shrink against the packed doubles the
  * raw column stores (more against Spark's array representation).
  * `scale` is the caller's per-vector max-|v_i| (see
  * IvfSearch.quantizeAssigned), so reconstruction error is bounded:
  * |v_i − code_i·scale/127| ≤ scale/254 per dimension, a bound
  * [[Q8Dot]] scoring inherits linearly and IvfSearchSpec pins.
  * Encode runs once per corpus vector at index-build time; it is still
  * codegen'd so the build pass stays inside whole-stage codegen.
  */
case class Q8Encode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "q8_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"q8_encode requires (array<double>, double), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = if (scale > 0) Math.round(v.getDouble(i) / scale * 127.0) else 0L
      out(i) = Math.max(-127L, Math.min(127L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = ($b > 0) ? java.lang.Math.round($a.getDouble($i) / $b * 127.0) : 0L;
         |  $out[$i] = (byte) java.lang.Math.max(-127L, java.lang.Math.min(127L, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Q8Encode =
    copy(left = l, right = r)
}

object Q8Encode {
  def apply(v: Column, scale: Column): Column =
    Bridge.column(Q8Encode(Bridge.expression(v), Bridge.expression(scale)))
}

/** Asymmetric int8 dot product — the HOT loop of the SQ8 search tier:
  * the float query stays exact, the corpus side reads one byte per
  * dimension. Returns Σ qv_i · code_i; the caller multiplies by
  * scale/127 to land in cosine space (keeping the scalar multiply
  * outside the loop). Same tight-primitive-loop rationale as
  * [[ArrayDot]]: bytes load straight from the unsafe row, no boxing.
  */
case class Q8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "q8_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(DoubleType, _), BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"q8_dot requires (array<double>, binary), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val n = math.min(v.numElements(), codes.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += v.getDouble(i) * codes(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Q8Dot =
    copy(left = l, right = r)
}

object Q8Dot {
  def apply(qv: Column, codes: Column): Column =
    Bridge.column(Q8Dot(Bridge.expression(qv), Bridge.expression(codes)))
}
