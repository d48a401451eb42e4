package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions-injected optimizer rule
  * (plans/HofDotRewrite): the naive HOF dot product is substituted with
  * the codegen'd ArrayDot, the guards keep every non-matching shape
  * untouched, and the substitution is value-identical — including the
  * ragged-array and null-array edges.
  */
class ExtensionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  test("the naive HOF dot product optimizes to array_dot (rule injected via extensions)") {
    import spark.implicits._
    // over a parquet scan: a literal LocalRelation would be constant-
    // folded away before the plan can be inspected
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform($"embedding", _.cast("double")).as("a"))
      .withColumn("b", $"a")
      .selectExpr(s"$hofDot AS s")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("array_dot"), s"rewrite did not fire:\n$opt")
    assert(!opt.contains("zip_with"), s"HOF survived:\n$opt")
    // and a plain literal expression still computes correctly end-to-end
    val v = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b").selectExpr(s"$hofDot AS s").head().getDouble(0)
    assert(v == 10.0)
  }

  test("the rewrite is value-identical on the embeddings corpus, ragged and null arrays included") {
    import spark.implicits._
    // corpus pairs: the rewritten HOF formula vs the direct expression
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val pairs = e.as("l").join(e.as("r"), $"l.vec_id" < $"r.vec_id")
      .select($"l.v".as("a"), $"r.v".as("b"))
    val viaHof = pairs.selectExpr(s"$hofDot AS s").as[Double].collect()
    val direct = pairs.select(graft.functions.ArrayDot($"a", $"b").as("s"))
      .as[Double].collect()
    assert(viaHof.length == direct.length && viaHof.sameElements(direct))
    // ragged arrays: both the HOF semantics and ArrayDot yield NULL
    val ragged = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b").selectExpr(s"$hofDot AS s")
    assert(ragged.head().isNullAt(0), "ragged dot must be null, not a truncated sum")
    // null input array propagates
    val nul = Seq((None: Option[Array[Double]], Some(Array(1.0))))
      .toDF("a", "b").selectExpr(s"$hofDot AS s")
    assert(nul.head().isNullAt(0))
    // a null ELEMENT nulls the whole dot in both formulations
    val nullable = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b").selectExpr(s"$hofDot AS s")
    assert(nullable.head().isNullAt(0), "null element must absorb the sum")
  }

  test("non-matching shapes are left alone: wrong zero, squared variable, custom finish") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    def optimized(sql: String): String =
      df.selectExpr(s"$sql AS s").queryExecution.optimizedPlan.toString
    // seeded fold: not a dot product
    assert(!optimized("aggregate(zip_with(a, b, (x, y) -> x * y), 1D, (acc, v) -> acc + v)")
      .contains("array_dot"))
    // sum of squares of ONE side's variable: not a dot product
    assert(!optimized("aggregate(zip_with(a, b, (x, y) -> x * x), 0D, (acc, v) -> acc + v)")
      .contains("array_dot"))
    // custom finish lambda: semantics beyond the kernel
    assert(!optimized("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v, acc -> acc + 1D)")
      .contains("array_dot"))
  }
}
