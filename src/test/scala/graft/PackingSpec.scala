package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("two-phase prefix sum equals the single-task global window exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(i => (i.toLong * 3 + 1, rnd.nextInt(500) + 1))
      .toDF("k", "v").repartition(16) // scrambled input partitioning
    val twoPhase = Packing.exclusivePrefixSum(df, "k", "v", "pre", numBuckets = 8)
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    val w = Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, -1)
    val global = df.withColumn("pre", coalesce(sum($"v").over(w), lit(0L)))
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    assert(twoPhase.size == 5000)
    assert(twoPhase == global)
  }

  test("packByBudget: packs are contiguous in key order and respect the budget boundary") {
    import spark.implicits._
    val df = (1L to 300L).map(k => (k, 70)).toDF("k", "tok")
    val packed = Packing.packByBudget(df, "k", "tok", budget = 1000L)
      .select($"k", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    // pack id never decreases in key order (contiguity)
    assert(packed.sliding(2).forall { case Array((_, a), (_, b)) => a <= b; case _ => true })
    // doc k starts at (k-1)*70 tokens: pack must be floor of that over 1000
    assert(packed.forall { case (k, p) => p == (k - 1) * 70 / 1000 })
  }

  test("more partitions than rows: empty partitions contribute zero offsets") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 7), (3L, 11)).toDF("k", "v")
    val got = Packing.exclusivePrefixSum(df, "k", "v", "pre", numBuckets = 8)
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 12L))
  }
}
