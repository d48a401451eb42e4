package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force: broadcast the (small) query set against the corpus —
  *    one scan of the corpus, no corpus self-shuffle; exact. This is the
  *    right plan whenever |queries| is small, even at 100 TB of corpus.
  *  - SRP-LSH: random-hyperplane signatures bucket the corpus; queries
  *    probe their own bucket (+ multi-probe neighbors) — approximate,
  *    corpus-scan-free per query once signatures are materialized.
  */
object SimSearch {

  /** Exact top-k cosine neighbors for each query row. `queries` should be
    * broadcast-small; the corpus is scanned once.
    * Returns (query_id, neighbor_id, cosine) with deterministic ranking
    * (cosine desc, neighbor_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }

  /** Exact all-pairs near-duplicates: (vec_a < vec_b, cosine >= threshold).
    * O(n²) — correct baseline at test scale; use `lshPairs` at corpus scale.
    */
  def bruteForcePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFns.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Approximate near-dup pairs via SRP-LSH: vectors sharing a `bits`-bit
    * random-hyperplane signature band become candidates, verified with
    * exact cosine. Recall < 1 (trades scan cost for completeness); at
    * 100 TB the bucket groupBy replaces the O(n²) cross join.
    *
    * `bands` signatures of `bits` bits each: a pair is a candidate if any
    * band matches exactly.
    */
  def lshPairs(corpus: DataFrame, threshold: Double,
               bits: Int = 12, bands: Int = 8): DataFrame = {
    val sigCols = (0 until bands).map { bd =>
      // independent hyperplane sets per band: offset the plane index
      struct(lit(bd).as("band"),
        VectorFns.srpSignatureOffset(col("embedding"), bits, bd * bits).as("bv"))
    }
    val banded = corpus
      .select(col("vec_id"), col("embedding"), explode(array(sigCols: _*)).as("bk"))
      .select(col("vec_id"), col("embedding"), col("bk.band"), col("bk.bv"))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("va"), col("b.embedding").as("vb"))
      .distinct()
    cands.withColumn("cosine", VectorFns.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }
}
