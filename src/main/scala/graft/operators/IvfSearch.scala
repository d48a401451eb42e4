package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns

/** IVF (inverted-file) approximate nearest-neighbor search.
  *
  * Index: deterministic Lloyd's k-means over unit vectors (seeded init =
  * k lowest xxhash64(vec_id) rows — reproducible without a random-state
  * file). Search: rank centroids per query, probe the `nprobe` nearest
  * inverted lists, exact-score only those candidates.
  *
  * Scale story (100 TB corpus): the corpus is scanned once to assign
  * cluster ids (k codegen'd ArrayDot's per row), then partitioned BY
  * cluster — each query touches nprobe/k of the data instead of all of
  * it. Centroids are driver-resident (k × dim doubles) and broadcast
  * into every stage as literal arrays. Centroid refinement shuffles
  * (cluster, dim-position, value) triples with map-side partial avg.
  */
object IvfSearch {

  case class IvfIndex(centroids: Array[Array[Double]])

  /** Unit-normalized corpus projection: (vec_id, uv). */
  private def unit(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id"), VectorFns.unitVector(col("embedding")).as("uv"))

  private def centroidCol(c: Array[Double]) = typedlit(c.toSeq)

  /** argmin over centroids of negative dot (unit vectors: max dot =
    * nearest by cosine). Returns the cluster id column.
    */
  private def assignCol(centroids: Array[Array[Double]]) = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFns.dotPre(col("uv"), centroidCol(c)).as("s"), lit(i).as("c"))
    }
    array_max(array(scored: _*)).getField("c").as("cluster")
  }

  /** The `n` nearest centroids to `vecCol`, exploded as struct(s, c)
    * rows best-first: score all nlist centroids (codegen'd dots),
    * array_sort descending by score, slice, explode — the shared
    * probe-selection stage of every search/assign entry point.
    *
    * Shape measured at production nlist (IvfProbe, 20k queries × dim 64,
    * round 12): nlist=256 costs ~19 µs/query end-to-end and the
    * interpreted lambda comparator is indistinguishable from the
    * codegen'd struct default ordering (0.38 vs 0.40 s) — the ranking
    * stage is noise next to the list-probe join it feeds, so no custom
    * top-nprobe expression is warranted (IMPLEMENTATION.md note).
    */
  private def nearestCentroids(vecCol: org.apache.spark.sql.Column,
                               centroids: Array[Array[Double]],
                               n: Int): org.apache.spark.sql.Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFns.dotPre(vecCol, centroidCol(c)).as("s"), lit(i).as("c"))
    }
    explode(slice(array_sort(
      array(scored: _*),
      (a, b) => when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1).otherwise(0)), 1, n))
  }

  /** Build the index: `k` centroids refined with `iters` Lloyd rounds. */
  def build(corpus: DataFrame, k: Int = 16, iters: Int = 3): IvfIndex = {
    val u = unit(corpus).cache()
    // deterministic seeding: k lowest-hash vectors
    var centroids: Array[Array[Double]] = u
      .orderBy(xxhash64(col("vec_id")))
      .limit(k)
      .select("uv").collect()
      .map(_.getSeq[Double](0).toArray)

    for (_ <- 0 until iters) {
      val assigned = u.withColumn("cluster", assignCol(centroids))
      val means = assigned
        .select(col("cluster"), posexplode(col("uv")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("m"))
        .groupBy("cluster").agg(map_from_arrays(
          collect_list("pos"), collect_list("m")).as("byPos"))
        .collect()
      means.foreach { r =>
        val cl = r.getInt(0)
        val byPos = r.getMap[Int, Double](1)
        val dim = centroids(cl).length
        val mean = Array.tabulate(dim)(i => byPos.getOrElse(i, 0.0))
        // spherical k-means: re-normalize, else argmax-dot assignment is
        // biased toward longer (tighter-cluster) centroids and stops
        // agreeing with argmax-cosine
        val n = math.sqrt(mean.map(x => x * x).sum)
        if (n > 0) centroids = centroids.updated(cl, mean.map(_ / n))
      }
    }
    u.unpersist()
    IvfIndex(centroids)
  }

  /** Assign every corpus vector to its inverted list. */
  def assign(corpus: DataFrame, index: IvfIndex): DataFrame =
    unit(corpus).withColumn("cluster", assignCol(index.centroids))

  /** MULTI-assignment (list replication, the FAISS "spilling" recall
    * lever): each corpus vector lands in its `nassign` nearest lists, so
    * a query probing p of k lists sees a candidate when ANY of the
    * vector's nassign lists is probed — on structureless corpora (where
    * a true neighbor sits near a Voronoi boundary as often as not) this
    * is the difference between ~p/k recall and the target floor at small
    * nprobe. Cost is storage, not query latency: lists grow ×nassign
    * (with SQ8 codes that is nassign bytes/dim — still ≪ raw floats)
    * while each probe reads the same nprobe lists. Duplicated
    * candidates are collapsed downstream before ranking.
    */
  def assignMulti(corpus: DataFrame, index: IvfIndex, nassign: Int = 2): DataFrame = {
    require(nassign >= 1 && nassign <= index.centroids.length,
      s"nassign $nassign out of range for ${index.centroids.length} lists")
    unit(corpus)
      .withColumn("asg", nearestCentroids(col("uv"), index.centroids, nassign))
      .select(col("vec_id"), col("uv"), col("asg.c").as("cluster"))
  }

  /** INCREMENTAL index maintenance: route an appended batch through the
    * EXISTING centroids and union it with the already-materialized
    * inverted lists — no re-clustering, so the append costs one scan of
    * the batch (k codegen'd dots per row), never a pass over the corpus.
    * This mirrors the batch-vs-index shape of `Dedup.dedupIncremental`:
    * the index is the long-lived artifact, each arriving batch folds in.
    *
    * Trade (documented, spec-pinned): appended mass does not move the
    * centroids until the next offline [[build]], so recall degrades only
    * if the batch's distribution drifts from the corpus the centroids
    * were trained on — IvfSearchSpec pins recall ≥ 0.8 for search over
    * an appended split against the exact full-corpus scan. Re-run
    * [[build]] when drift accumulates (the usual IVF deployment cadence).
    */
  def appendAssigned(assigned: DataFrame, batch: DataFrame, index: IvfIndex): DataFrame =
    assigned.unionByName(assign(batch, index))

  /** Mean centroid AFFINITY — avg dot of each unit vector with its
    * assigned centroid — the DRIFT STATISTIC for the append-without-
    * re-clustering policy: a batch drawn from the trained distribution
    * scores ≈ the corpus baseline; a batch whose distribution shifted
    * away from the centroids scores measurably lower (its vectors sit
    * far from every list center, so probing degrades). One
    * aggregation over the assignment (k codegen'd dots were already
    * paid at assign time; this re-derives only the assigned one), cheap
    * enough to run per batch as append-time telemetry.
    */
  def meanAffinity(assigned: DataFrame, index: IvfIndex): Double = {
    val aff = index.centroids.zipWithIndex.map { case (c, i) =>
      when(col("cluster") === i, VectorFns.dotPre(col("uv"), centroidCol(c)))
    }.reduce(coalesce(_, _))
    assigned.agg(coalesce(avg(aff), lit(Double.NaN))).head().getDouble(0)
  }

  /** RE-CLUSTER TRIGGER (the documented deployment policy, spec-pinned):
    * compare each arriving batch's [[meanAffinity]] against the corpus
    * baseline captured at [[build]] time; when the batch sits more than
    * `margin` below the baseline, the centroids no longer describe the
    * data and the next offline [[build]] should run over the full
    * corpus. Appends themselves stay O(batch) — the trigger only decides
    * WHEN the periodic re-cluster is due, replacing a blind cadence with
    * a measured one.
    */
  def shouldRecluster(corpusAffinity: Double, batchAffinity: Double,
                      margin: Double = 0.1): Boolean =
    batchAffinity < corpusAffinity - margin

  /** Top-k cosine neighbors per query, probing `nprobe` inverted lists.
    * Approximate: neighbors outside the probed lists are missed (spec
    * pins recall against the exact baseline).
    */
  def topK(corpus: DataFrame, queries: DataFrame, index: IvfIndex,
           k: Int = 5, nprobe: Int = 4): DataFrame =
    topKAssigned(assign(corpus, index), queries, index, k, nprobe)

  /** INT8 scalar-quantization (SQ8) tier over the inverted lists: each
    * list vector is stored as one byte per dimension plus one double
    * scale — the serving-memory tier between raw floats (this file's
    * default) and PQ codes ([[PqSearch]], ~32x). Memory factor: a
    * 64-dim unit vector is 512 B of packed doubles (more as a Spark
    * array) vs 64 B of codes + 8 B scale ≈ 8x. Quantization is
    * per-vector max-|v| symmetric: code_i = round(v_i/scale·127), so
    * every reconstructed component is within scale/254 of the truth and
    * an asymmetric (float query × int8 corpus) dot is within
    * (scale/254)·Σ|qv_i| of the exact dot — a certified bound
    * IvfSearchSpec pins per pair, the KLL discipline applied to ANN.
    * The raw `uv` column is dropped: at serving time the probed scan
    * reads ONLY codes (the 8x is real, not additive).
    */
  def quantizeAssigned(assigned: DataFrame): DataFrame = {
    import graft.functions.Q8Encode
    assigned
      .withColumn("scale", array_max(transform(col("uv"), x => abs(x))))
      .select(col("vec_id"), col("cluster"), col("scale"),
        Q8Encode(col("uv"), col("scale")).as("q8"))
  }

  /** Top-k over the SQ8 tier: probe `nprobe` lists, score candidates
    * with the asymmetric int8 dot (one byte per dim read), keep a
    * `shortlist` per query, then re-rank the shortlist EXACTLY against
    * the raw vectors (`rawCorpus`, joined by id — a constant-size
    * point lookup per query at serving scale). Approximate only through
    * list pruning and shortlist truncation; the int8 rounding itself
    * cannot reorder the final top-k past the exact re-rank.
    */
  def topKQuantized(quantized: DataFrame, rawCorpus: DataFrame, queries: DataFrame,
                    index: IvfIndex, k: Int = 5, nprobe: Int = 4,
                    shortlist: Int = 64): DataFrame = {
    import graft.functions.Q8Dot
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val qu = unit(queries).select(col("vec_id").as("query_id"), col("uv").as("qv"))
    val probes = qu
      .withColumn("probe", nearestCentroids(col("qv"), index.centroids, nprobe))
      .select(col("query_id"), col("qv"), col("probe.c").as("cluster"))

    val lists = quantized.select(col("vec_id").as("neighbor_id"),
      col("cluster"), col("scale"), col("q8"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val short = probes.join(lists, "cluster")
      .filter(col("neighbor_id") =!= col("query_id"))
      // multi-assigned corpora surface a candidate once per shared
      // probed list — collapse BEFORE the shortlist window so
      // duplicates cannot crowd out distinct candidates
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("approx", Q8Dot(col("qv"), col("q8")) * col("scale") / lit(127.0))
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= shortlist)
      .select(col("query_id"), col("qv"), col("neighbor_id"))

    // r20 rerank shape (guide §3.1): broadcast the BOUNDED shortlist
    // (≤ |queries|·shortlist rows) and STREAM the raw corpus through the
    // join, normalizing only matched rows. The previous join let the
    // planner broadcast unit(rawCorpus) — the WHOLE normalized corpus
    // built into a broadcast relation (driver + every-executor copies;
    // a corpus-sized broadcast is exactly the 8 GB-cap failure at
    // scale), with every corpus row paying the sqrt/divide chain before
    // the join could drop it. Same rows bit-for-bit: inner join on the
    // same keys, the same unit/dot expressions on the matched rows.
    val rawSlim = rawCorpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("__emb"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(short).join(rawSlim, Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFns.dotPre(col("qv"), VectorFns.unitVector(col("__emb"))))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }

  /** Sign-packed signatures INSIDE the inverted lists — the memory
    * ladder's last rung (raw → SQ8 → PQ → binary) composed with the
    * router: each list entry stores only (cluster, 1-bit sign words),
    * ceil(dim/32) longs per vector. Signs come from the RAW embedding
    * ([[graft.operators.SimSearch.signPack]] — positive scaling never
    * flips a sign, so unit-normalizing first would change nothing).
    * Supports [[assignMulti]]-style replication by passing a
    * multi-assigned frame's (vec_id, cluster) pairs via `assigned`;
    * the default single-assigns via [[assign]]. A multi-assigned
    * corpus surfaces a vector once per replica list, which is why
    * [[topKSigned]] collapses (query, neighbor) duplicates before its
    * shortlist window.
    */
  def signAssigned(corpus: DataFrame, index: IvfIndex,
                   dimOverride: Int = -1,
                   assigned: Option[DataFrame] = None): DataFrame =
    assigned
      .getOrElse(assign(corpus, index))
      .select(col("vec_id"), col("cluster"))
      .join(SimSearch.signPack(corpus, dimOverride), Seq("vec_id"))

  /** Top-k over the SIGN tier inside the IVF router: probe `nprobe`
    * lists, Hamming-score ONLY their members (the probed scan reads
    * ~nprobe/nlist × dim/32 of the corpus bytes — q190's whole-corpus
    * binary scan divided by the router), keep a `shortlist`, re-rank
    * EXACTLY against raw vectors. Approximate through list pruning and
    * shortlist truncation only; with nprobe == nlist the candidate set
    * is the whole corpus and the result EQUALS the un-routed binary
    * tier ([[SimSearch.hammingRerankTopK]]) — IvfSearchSpec pins that
    * equality, the recall floor at small nprobe, and nprobe
    * monotonicity.
    */
  def topKSigned(signed: DataFrame, rawCorpus: DataFrame, queries: DataFrame,
                 index: IvfIndex, k: Int = 5, nprobe: Int = 4,
                 shortlist: Int = 64, dimOverride: Int = -1): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    // one dim probe, from the RAW corpus the signed lists were packed
    // from (the hammingTopK discipline): a second independent probe on
    // the queries could disagree on ragged inputs and silently null the
    // distances through zip_with padding
    val dim = SimSearch.inferDim(rawCorpus, dimOverride)
    val qu = unit(queries).select(col("vec_id").as("query_id"), col("uv").as("qv"))
    val probes = qu
      .withColumn("probe", nearestCentroids(col("qv"), index.centroids, nprobe))
      .select(col("query_id"), col("qv"), col("probe.c").as("cluster"))
    val qsig = SimSearch.signPack(queries, dim)
      .select(col("vec_id").as("query_id"), col("sig").as("qsig"))
    val lists = signed.select(col("vec_id").as("neighbor_id"),
      col("cluster"), col("sig").as("csig"))
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    val short = probes.join(broadcast(qsig), Seq("query_id"))
      .join(lists, Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // multi-assigned corpora surface a candidate once per shared
      // probed list — collapse BEFORE the shortlist window
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("hamming", SimSearch.hammingDist(col("qsig"), col("csig")))
      .withColumn("hrk", row_number().over(wHam))
      .filter(col("hrk") <= shortlist)
      .select(col("query_id"), col("qv"), col("neighbor_id"))
    // r20 rerank shape — see topKQuantized: broadcast the bounded
    // shortlist, stream the corpus, normalize only matched rows.
    val rawSlim = rawCorpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("__emb"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(short).join(rawSlim, Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFns.dotPre(col("qv"), VectorFns.unitVector(col("__emb"))))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }

  /** ALL corpus vectors above a cosine THRESHOLD per query (not top-k),
    * probing `nprobe` inverted lists — the candidate generator for
    * threshold-semantics consumers like semantic decontamination
    * (q184's exact broadcast-NL baseline swaps to this at corpus
    * scale): a benchmark set runs as `queries`, and any corpus vector
    * surfacing here with cosine >= `threshold` is contamination.
    * Approximate only through list pruning (a contaminated vector in an
    * unprobed list is missed — IvfSearchSpec pins the recall floor);
    * output (query_id, neighbor_id, cosine), no per-query cap, so
    * downstream anti-joins see EVERY candidate the probe surfaces.
    *
    * `excludeSelf` (default true) assumes queries and corpus share ONE
    * id space and drops `neighbor_id == query_id` pairs — correct when
    * the benchmark set is a subset of the same table (the q184/q185
    * setup). When benchmark and corpus ids come from INDEPENDENT tables,
    * an accidental id collision would silently suppress a true
    * contamination candidate — pass `excludeSelf = false` there.
    */
  def aboveThreshold(assigned0: DataFrame, queries: DataFrame, index: IvfIndex,
                     threshold: Double, nprobe: Int = 4,
                     excludeSelf: Boolean = true): DataFrame = {
    val assigned = assigned0
      .select(col("vec_id").as("neighbor_id"), col("uv").as("cv"), col("cluster"))
    val qu = unit(queries).select(col("vec_id").as("query_id"), col("uv").as("qv"))
    val probes = qu
      .withColumn("probe", nearestCentroids(col("qv"), index.centroids, nprobe))
      .select(col("query_id"), col("qv"), col("probe.c").as("cluster"))
    val joined = probes.join(assigned, "cluster")
    val paired =
      if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
      else joined
    paired
      .withColumn("cosine", VectorFns.dotPre(col("qv"), col("cv")))
      .filter(col("cosine") >= threshold)
      // multi-assigned corpora surface a candidate once per shared list
      .dropDuplicates("query_id", "neighbor_id")
      .select("query_id", "neighbor_id", "cosine")
  }

  /** topK against pre-materialized inverted lists (`assign` output).
    * The build/assign phase is IVF's offline cost — a deployment
    * materializes the lists once and serves every query from them, so
    * callers that hold the assignment should use this entry point.
    */
  def topKAssigned(assigned0: DataFrame, queries: DataFrame, index: IvfIndex,
                   k: Int = 5, nprobe: Int = 4): DataFrame = {
    val assigned = assigned0
      .select(col("vec_id").as("neighbor_id"), col("uv").as("cv"), col("cluster"))

    // per query: nprobe nearest centroids
    val qu = unit(queries).select(col("vec_id").as("query_id"), col("uv").as("qv"))
    val probes = qu
      .withColumn("probe", nearestCentroids(col("qv"), index.centroids, nprobe))
      .select(col("query_id"), col("qv"), col("probe.c").as("cluster"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, "cluster")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFns.dotPre(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }
}
