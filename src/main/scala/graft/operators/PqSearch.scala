package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns

/** Product quantization (PQ) for approximate nearest-neighbor search —
  * the compressed-codes member of the ANN family, next to [[SimSearch]]
  * (exact + SRP-LSH) and [[IvfSearch]] (inverted lists). The corpus is
  * stored as M byte codes per vector instead of D floats: each vector is
  * split into M subspaces of D/M dims and each sub-vector is replaced by
  * the id of its nearest sub-centroid (min-L2, the PQ quantizer). At
  * D=64, M=8, Ks=16 that is 8 small ints vs 512 bytes of doubles — the
  * 100 TB story is exactly this compression: the ADC scan reads codes,
  * never raw vectors, so the scannable corpus shrinks ~64× and the
  * re-rank touches only a constant number of raw rows per query.
  *
  * Search is ADC (asymmetric distance computation, the FAISS shape):
  * per query ONE lookup table of M×Ks sub-dots (query sub-vector ×
  * sub-centroid — computed as literal-array column arithmetic, no UDF),
  * then each candidate scores with M array lookups + adds instead of a
  * D-wide dot. Optional exact re-rank of the top `rerank` ADC
  * candidates restores exactness whenever the true neighbors sit inside
  * the candidate set (PqSearchSpec pins recall; q135 pins the re-ranked
  * top-k against the exact oracle).
  *
  * Training follows the standard deployment: sub-k-means per subspace on
  * a DETERMINISTIC bounded sample (lowest-xxhash rows — same seeding
  * discipline as IvfSearch), driver-local like every other bounded
  * materialization in this repo; encoding and search are fully
  * distributed. Everything is reproducible: no random state anywhere.
  */
object PqSearch {

  /** codebooks(m)(c) = sub-centroid c of subspace m (dsub doubles). */
  case class PqIndex(codebooks: Array[Array[Array[Double]]], dim: Int) {
    def m: Int = codebooks.length
    def ks: Int = codebooks(0).length
    def dsub: Int = dim / m
  }

  private def unit(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), VectorFns.unitVector(col("embedding")).as("uv"))

  /** Train M sub-codebooks of Ks centroids each with `iters` Lloyd
    * rounds over a deterministic sample of ≤ `sampleCap` unit vectors
    * (lowest xxhash64(vec_id) — reproducible, no random state). The
    * sample is a bounded driver materialization (sampleCap × dim
    * doubles); encode/search never touch the driver.
    */
  def train(corpus: DataFrame, m: Int = 8, ks: Int = 16, iters: Int = 5,
            sampleCap: Int = 2048): PqIndex = {
    val sample = unit(corpus)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleCap)
      .select("uv").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val dsub = dim / m

    val codebooks = Array.tabulate(m) { sub =>
      val subVecs = sample.map(v => v.slice(sub * dsub, (sub + 1) * dsub))
      // seed: first ks sample rows (already hash-ordered); pad by cycling
      var cents = Array.tabulate(math.min(ks, subVecs.length))(subVecs(_))
      if (cents.length < ks)
        cents = Array.tabulate(ks)(i => subVecs(i % subVecs.length).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ks, dsub)(0.0)
        val counts = Array.fill(ks)(0)
        subVecs.foreach { v =>
          val c = nearestSub(v, cents)
          counts(c) += 1
          var i = 0; while (i < dsub) { sums(c)(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(ks) { c =>
          if (counts(c) == 0) cents(c) // empty cell keeps its centroid
          else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
    PqIndex(codebooks, dim)
  }

  private def nearestSub(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Codebook flattened row-major for the native PQ expressions: cell
    * (sub, c) at [((sub·ks)+c)·dsub, +dsub).
    */
  private[operators] def flatCodebook(index: PqIndex): Array[Double] = {
    val flat = new Array[Double](index.m * index.ks * index.dsub)
    for (sub <- 0 until index.m; c <- 0 until index.ks)
      System.arraycopy(index.codebooks(sub)(c), 0, flat,
        (sub * index.ks + c) * index.dsub, index.dsub)
    flat
  }

  /** Encode the corpus: (vec_id, uv, codes[M]) — the stored form. A
    * deployment persists (vec_id, codes) and DROPS uv from the scan
    * path; uv rides along here so the re-rank stage can exact-score
    * candidates without a second corpus join. Encoding is ONE native
    * expression ([[graft.functions.PqExprs]]) — a tight codegen'd loop,
    * not M×Ks unrolled dot columns (which blow past Janino's limits and
    * drop the stage to interpreted eval).
    */
  def encode(corpus: DataFrame, index: PqIndex): DataFrame =
    unit(corpus).select(col("vec_id"), col("uv"),
      graft.functions.PqExprs.encode(col("uv"), flatCodebook(index),
        index.m, index.ks, index.dsub).as("codes"))

  /** Top-k cosine neighbors per query over PQ codes: ADC scoring (M
    * lookups + adds per candidate against a per-query M×Ks lookup
    * table), then exact re-rank of the top `rerank` ADC candidates.
    * With `rerank` ≥ k the result is EXACT whenever every true top-k
    * neighbor lands in the ADC candidate set — the property q135 pins
    * against the brute-force oracle.
    */
  def topK(encoded: DataFrame, queries: DataFrame, index: PqIndex,
           k: Int = 5, rerank: Int = 64): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val qu = unit(queries).select(col("vec_id").as("query_id"), col("uv").as("qv"))
    // per-query ADC lookup table: lut[m][c] = q_sub(m) · cent(m)(c),
    // M×Ks sub-dots computed ONCE per query by one native expression;
    // each candidate then scores with M array lookups (PqAdcExpr)
    val flat = flatCodebook(index)
    val cand = qu.withColumn("lut",
        graft.functions.PqExprs.lut(col("qv"), flat, index.m, index.ks, index.dsub))
      .crossJoin(encoded.select(col("vec_id").as("neighbor_id"),
        col("uv").as("cv"), col("codes")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", graft.functions.PqExprs.adc(col("lut"), col("codes")))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("adc_rk", row_number().over(wAdc))
      .filter(col("adc_rk") <= rerank)
      .withColumn("cosine", VectorFns.dotPre(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }
}
