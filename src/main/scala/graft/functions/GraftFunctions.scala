package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom Catalyst functions, so the
  * spark.sql surface is at parity with the Column API:
  *
  *   SELECT array_dot(a, b), minhash_sketch(sh, 64) ...
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("minhash_sketch",
      exprs => {
        val n = exprs(1).eval(null).asInstanceOf[Number].intValue()
        MinHashSketch(exprs(0), n)
      }, "built-in")
  }
}
