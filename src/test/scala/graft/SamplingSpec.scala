package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Properties of deterministic weighted sampling: replayability (pure
  * function of ids/weights/seed), exact agreement with a from-scratch
  * integer recompute, and the weight bias that makes it a SAMPLER rather
  * than an arbitrary top-k.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("sample is a pure function of (ids, weights, seed); k rows per group; priorities match a Scala recompute") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", 10L + i % 7)).toDF("id", "grp", "w")
    def run() = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", k = 5, seed = 7L)
      .select($"grp", $"id", $"__priority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val a = run()
    assert(a == run(), "same seed must reselect the identical rows")
    assert(a.groupBy(_._1).values.forall(_.size == 5), "k rows per group")
    // repartitioning must not change membership
    val b = Sampling.weightedSamplePerGroup(df.repartition(13), "grp", "id", "w", k = 5, seed = 7L)
      .select($"grp", $"id", $"__priority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(a == b, "partitioning leaked into the sample")
    // exact integer recompute of every selected priority
    a.foreach { case (_, id, pri) =>
      val x = (id + 7L) % Sampling.M
      val h = x * x % Sampling.M * Sampling.A % Sampling.M
      assert(pri == h * 1000000L / (10L + id % 7), s"priority mismatch for id=$id")
    }
    // a different seed is a different permutation → (overwhelmingly) a
    // different sample
    val c = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", k = 5, seed = 8L)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(a.map(_._2).toSet != c, "seed had no effect")
  }

  test("selection frequency scales with weight across seeds") {
    import spark.implicits._
    // one stratum, 20 items; item 7 is 100x heavier than the rest
    val df = (0L until 20L).map(i => (i, "g", if (i == 7L) 2000L else 20L)).toDF("id", "grp", "w")
    val seeds = 0L until 40L
    val picks = seeds.flatMap { s =>
      Sampling.weightedSamplePerGroup(df, "grp", "id", "w", k = 3, seed = s)
        .select(col("id")).collect().map(_.getLong(0))
    }
    val heavy = picks.count(_ == 7L)
    // P(heavy in top-3) ≈ 1: its priority is h/2000 vs h/20 — two orders
    // of magnitude smaller at equal hash scale
    assert(heavy >= 36, s"heavy item picked only $heavy/40 times")
    val lightAvg = picks.count(_ != 7L).toDouble / 19.0
    assert(heavy > 5 * lightAvg,
      s"weight bias too weak: heavy=$heavy vs light avg=$lightAvg")
  }
}
