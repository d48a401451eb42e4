package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{PqExprs, VectorFns}

/** IVF-PQ: the composed ANN index — [[IvfSearch]]'s inverted lists
  * restrict WHICH candidates are scored, [[PqSearch]]'s codes decide
  * HOW CHEAPLY each candidate scores. This is the canonical
  * billion-vector architecture (FAISS IndexIVFPQ): at 100 TB the scan
  * per query touches `nprobe/k` of the corpus AND reads ~32×-compressed
  * codes instead of raw vectors — the two reductions multiply. The
  * exact re-rank stage then touches only `rerank` raw vectors per
  * query, a constant.
  *
  * All three phases reuse the existing operators' artifacts: the
  * cluster assignment ([[IvfSearch.assign]]), the PQ codebooks
  * ([[PqSearch.train]]), and the native PQ expressions — this file only
  * composes them relationally.
  */
object IvfPq {

  /** (vec_id, uv, cluster, codes): the stored index rows — inverted
    * lists whose entries are PQ codes. A deployment partitions this BY
    * cluster and drops uv from the scan path (it rides along here so
    * the re-rank stage needs no second corpus join).
    */
  def encodeAssigned(corpus: DataFrame, ivf: IvfSearch.IvfIndex,
                     pq: PqSearch.PqIndex): DataFrame =
    IvfSearch.assign(corpus, ivf)
      .withColumn("codes", PqExprs.encode(col("uv"),
        PqSearch.flatCodebook(pq), pq.m, pq.ks, pq.dsub))

  /** Top-k cosine neighbors: probe the `nprobe` nearest inverted lists,
    * ADC-score only their (compressed) entries, exact-re-rank the top
    * `rerank`. Approximate: a true neighbor in an unprobed list is
    * missed — recall vs nprobe is pinned in PqSearchSpec.
    */
  def topK(encoded: DataFrame, queries: DataFrame, ivf: IvfSearch.IvfIndex,
           pq: PqSearch.PqIndex, k: Int = 5, nprobe: Int = 4,
           rerank: Int = 256): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val qu = queries.select(col("vec_id").as("query_id"),
      VectorFns.unitVector(col("embedding")).as("qv"))
    // nprobe nearest centroids per query (same probe construction as
    // IvfSearch.topKAssigned), plus the per-query ADC lookup table
    val probeScores = ivf.centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFns.dotPre(col("qv"), typedlit(c.toSeq)).as("s"), lit(i).as("c"))
    }
    val probes = qu
      .withColumn("lut", PqExprs.lut(col("qv"),
        PqSearch.flatCodebook(pq), pq.m, pq.ks, pq.dsub))
      .withColumn("probe", explode(slice(array_sort(
        array(probeScores: _*),
        (a, b) => when(a.getField("s") > b.getField("s"), -1)
          .when(a.getField("s") < b.getField("s"), 1).otherwise(0)), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("lut"), col("probe.c").as("cluster"))

    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes
      .join(encoded.select(col("vec_id").as("neighbor_id"), col("uv").as("cv"),
        col("cluster"), col("codes")), "cluster")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc", PqExprs.adc(col("lut"), col("codes")))
      .withColumn("adc_rk", row_number().over(wAdc))
      .filter(col("adc_rk") <= rerank)
      .withColumn("cosine", VectorFns.dotPre(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }
}
