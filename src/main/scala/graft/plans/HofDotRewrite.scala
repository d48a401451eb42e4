package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.ArrayDot

/** Catalyst optimizer rule: rewrite the NAIVE higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[ArrayDot]] — measured ~30x on all-pairs
  * similarity (HOFs are CodegenFallback: interpreted lambda dispatch and
  * a materialized intermediate array per row, vs one fused primitive
  * loop inside whole-stage codegen). Users and generated SQL write the
  * obvious formula; the engine substitutes the fast kernel — precisely
  * what a SparkSessionExtensions optimizer rule is FOR (the rest of the
  * engine deliberately needs no custom rules: Catalyst's stock
  * optimizations cover it, see SURVEY §4).
  *
  * The match is deliberately NARROW, and semantics-preserving by
  * construction:
  *   - zero must be literal 0.0 and the merge a plain acc + v with the
  *     finish lambda the identity — anything else (sums of squares,
  *     seeded folds, custom finishes) is left alone;
  *   - the multiply must reference the two DISTINCT zip variables (by
  *     exprId), so (x, y) -> x * x never matches;
  *   - both inputs must be array<double>;
  *   - the null edges agree BY CONSTRUCTION: a null element nulls the
  *     HOF's product and its sum, and zip_with pads ragged arrays with
  *     null — ArrayDot returns null on any null element or length
  *     mismatch, so the substitution is value-identical everywhere.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` in
  * GraftSession — every session (Verify, Bench, tests, SQL surface)
  * gets it; ExtensionSpec pins the substitution and its guards.
  */
object HofDotRewrite extends Rule[LogicalPlan] {

  private def distinctPair(e1: Expression, e2: Expression,
                           v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
        if distinctPair(mul.left, mul.right, x, y) &&
          distinctPair(add.left, add.right, acc, v) &&
          fin.exprId == facc.exprId &&
          doubleArray(left) && doubleArray(right) =>
      ArrayDot(left, right)
  }
}
