package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * (Rabin-Karp): h₀ = seed; hᵢ = (hᵢ₋₁·base + cᵢ) mod m over the
  * string's Unicode code points.
  *
  * The higher-order-function route (`aggregate(transform(split(...)))`)
  * is interpreted (CodegenFallback) and allocates one array element per
  * character; this expression generates a tight primitive loop inside
  * whole-stage codegen. Semantics match the HOF formulation for all BMP
  * text (astral chars: this folds true code points, where split-on-empty
  * folds UTF-16 code units — the code-point fold is also what the DuckDB
  * oracle's per-character UNICODE() computes).
  */
case class RollingHash(child: Expression, seed: Long, base: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 0 && base > 0, s"base/mod must be positive: base=$base mod=$mod")
  // (mod-1)*base + max-codepoint must not overflow a signed 64-bit long
  require(mod - 1 <= (Long.MaxValue - 0x10FFFF) / base,
    s"(mod-1)*base + maxCodePoint would overflow Long: base=$base mod=$mod")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // reduce the seed first: a raw seed >= mod would overflow h*base on
    // the first character (floorMod also normalizes negative seeds)
    var h = java.lang.Math.floorMod(seed, mod)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $c.toString();
         |long $h = java.lang.Math.floorMod(${seed}L, ${mod}L);
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * ${base}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(c: Column, seed: Long = 7L, base: Long = 31L,
            mod: Long = 1000000007L): Column =
    Bridge.column(RollingHash(Bridge.expression(c), seed, base, mod))
}
