package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFns
import graft.operators.SimSearch

class SimSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("cosine matches a hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFns.cosine($"a", $"b")).as[Double].head()
    val exp = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("bruteForceTopK returns k deterministic neighbors per query") {
    val corpus = Tables.embeddings(spark, sf)
    val got = SimSearch.bruteForceTopK(corpus, corpus.filter(col("vec_id") < 3), 5)
    val rows = got.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // rank 1 has the max cosine within each query group
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("SRP-LSH finds planted near-duplicate vectors (high-cosine regime)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    // 50 random vectors + 10 planted near-dup pairs (tiny perturbation)
    val base = (0 until 50).map(i => (i.toLong, vec().toSeq))
    val planted = (0 until 10).flatMap { i =>
      val v = vec()
      val w = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((100L + i * 2, v.toSeq), (101L + i * 2, w.toSeq))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val got = SimSearch.lshPairs(corpus, 0.95, bits = 12, bands = 8)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 10).map(i => (100L + i * 2, 101L + i * 2)).toSet
    // all output pairs are genuinely similar, and recall on planted pairs >= 0.9
    assert(got.subsetOf(expected))
    assert(got.size >= 9, s"recall too low: ${got.size}/10")
  }
}
