package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (see
  * [[graft.operators.PqSearch]]).
  *
  * Why custom expressions and not composed builtins: encoding is an
  * argmin over M×Ks sub-centroids (M·Ks·dsub multiply-adds per row).
  * Unrolled into literal-array column arithmetic that is thousands of
  * expression nodes — past Janino's method limits, so whole-stage
  * codegen FAILS and the whole stage falls back to interpreted eval
  * (observed: InternalCompilerException at M=16, Ks=64). Each
  * expression here is ONE node wrapping a tight primitive loop over a
  * codebook referenced via `addReferenceObj`, the same discipline as
  * [[ArrayDot]] — constant codegen size regardless of M/Ks/dim.
  *
  * The codebook is flattened row-major: cell (sub, c) occupies
  * [((sub·ks)+c)·dsub, +dsub).
  */
object PqExprs {

  /** Validated array<double> input check shared by the PQ expressions. */
  private[functions] def requireDoubleArray(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double>, got ${other.sql}")
    }

  def encode(uv: Column, flat: Array[Double], m: Int, ks: Int, dsub: Int): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(uv), flat, m, ks, dsub))

  def lut(qv: Column, flat: Array[Double], m: Int, ks: Int, dsub: Int): Column =
    Bridge.column(PqLutExpr(Bridge.expression(qv), flat, m, ks, dsub))

  def adc(lut: Column, codes: Column): Column =
    Bridge.column(PqAdcExpr(Bridge.expression(lut), Bridge.expression(codes)))
}

/** array<double> vector → array<int> of M min-L2 sub-codes. Argmin uses
  * the expanded square (sub·c − ‖c‖²/2 maximized); ties break to the
  * LOWEST code id (strict `>` on a left-to-right scan) for cross-run
  * determinism. `halfNorms(sub·ks + c)` caches ‖c‖²/2.
  */
case class PqEncodeExpr(child: Expression, flat: Array[Double],
                        m: Int, ks: Int, dsub: Int) extends UnaryExpression {

  private lazy val halfNorms: Array[Double] = Array.tabulate(m * ks) { cell =>
    var s = 0.0; var i = 0
    while (i < dsub) { val x = flat(cell * dsub + i); s += x * x; i += 1 }
    s / 2.0
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.requireDoubleArray(prettyName, child)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < ks) {
        val cell = sub * ks + c
        var s = 0.0; var i = 0
        while (i < dsub) { s += v.getDouble(sub * dsub + i) * flat(cell * dsub + i); i += 1 }
        s -= halfNorms(cell)
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val hn = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val cell = ctx.freshName("cell")
      s"""
         |int[] $codes = new int[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0; double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    int $cell = $sub * $ks + $c;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $s += $v.getDouble($sub * $dsub + $i) * $cb[$cell * $dsub + $i];
         |    }
         |    $s -= $hn[$cell];
         |    if ($s > $bestS) { $bestS = $s; $best = $c; }
         |  }
         |  $codes[$sub] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Query vector → ADC lookup table array<array<double>>: lut[sub][c] =
  * q_sub · cent(sub)(c). Computed once per query row; every candidate
  * then scores with M lookups ([[PqAdcExpr]]) instead of a D-wide dot.
  */
case class PqLutExpr(child: Expression, flat: Array[Double],
                     m: Int, ks: Int, dsub: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"
  override def checkInputDataTypes(): TypeCheckResult =
    PqExprs.requireDoubleArray(prettyName, child)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val rows = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val row = new Array[Double](ks)
      var c = 0
      while (c < ks) {
        var s = 0.0; var i = 0
        while (i < dsub) { s += v.getDouble(sub * dsub + i) * flat((sub * ks + c) * dsub + i); i += 1 }
        row(c) = s
        c += 1
      }
      rows(sub) = new GenericArrayData(row)
      sub += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val rows = ctx.freshName("rows"); val row = ctx.freshName("row")
      val sub = ctx.freshName("sub"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |Object[] $rows = new Object[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  double[] $row = new double[$ks];
         |  for (int $c = 0; $c < $ks; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      $s += $v.getDouble($sub * $dsub + $i) * $cb[($sub * $ks + $c) * $dsub + $i];
         |    }
         |    $row[$c] = $s;
         |  }
         |  $rows[$sub] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** (lut array<array<double>>, codes array<int>) → Σ_sub lut[sub][codes[sub]]
  * — the per-candidate ADC score: M array reads + adds, no vector math.
  */
case class PqAdcExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), got ${l.sql} and ${r.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    var s = 0.0
    var sub = 0
    val n = codes.numElements()
    while (sub < n) {
      s += lut.getArray(sub).getDouble(codes.getInt(sub))
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val sub = ctx.freshName("sub")
      val n = ctx.freshName("n")
      s"""
         |double $s = 0.0;
         |int $n = $b.numElements();
         |for (int $sub = 0; $sub < $n; $sub++) {
         |  $s += $a.getArray($sub).getDouble($b.getInt($sub));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}
