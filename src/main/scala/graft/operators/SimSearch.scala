package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force: broadcast the (small) query set against the corpus —
  *    one scan of the corpus, no corpus self-shuffle; exact. This is the
  *    right plan whenever |queries| is small, even at 100 TB of corpus.
  *  - SRP-LSH: random-hyperplane signatures bucket the corpus; candidate
  *    pairs come from signature-band collisions — approximate,
  *    corpus-scan-free per query once signatures are materialized.
  *
  * Hot path discipline: every vector is L2-normalized ONCE
  * (VectorFns.unitVector), so each pairwise score is a single codegen'd
  * ArrayDot — measured ~25x over the interpreted higher-order-function
  * formulation at sf0.1.
  */
object SimSearch {

  /** The embedding dimension: the caller's override, else probed from
    * the first corpus row. Loud on an empty corpus — a bare head()
    * would die with NoSuchElementException and no hint that the dim
    * probe is the cause (a filtered-to-empty batch in an incremental
    * pipeline is the realistic trigger).
    */
  private[operators] def inferDim(corpus: DataFrame, dimOverride: Int): Int =
    if (dimOverride > 0) dimOverride
    else {
      val first = corpus.select(size(col("embedding"))).limit(1).collect()
      require(first.nonEmpty,
        "cannot infer the embedding dimension from an empty corpus; pass dimOverride")
      // same unhelpful-failure class as the empty corpus: a NULL
      // embedding in the probed row would NPE out of getInt with no
      // hint that the dim probe is the cause
      require(!first(0).isNullAt(0),
        "cannot infer the embedding dimension: the probed corpus row has a " +
          "NULL embedding column; filter nulls upstream or pass dimOverride")
      first(0).getInt(0)
    }

  /** Exact top-k cosine neighbors for each query row. `queries` should be
    * broadcast-small; the corpus is scanned once.
    * Returns (query_id, neighbor_id, cosine, rk) with deterministic
    * ranking (cosine desc, neighbor_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      VectorFns.unitVector(col("embedding")).as("qv"))
    // r20 (the q184 change-14 precedent, guide §2.5): the |corpus| ×
    // |queries| dot grid evaluates INSIDE the corpus scan stage — on a
    // one-row-group input that is the whole quadratic grid on one core.
    // Scatter.even on the pruned projection moves it behind one narrow
    // exchange (identity when the scan already plans cluster-wide).
    val c = Scatter.even(
        corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq(col("neighbor_id")))
      .select(col("neighbor_id"), VectorFns.unitVector(col("embedding")).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFns.dotPre(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }

  /** Exact all-pairs near-duplicates: (vec_a < vec_b, cosine >= threshold).
    *
    * O(n²) cross join with a full-corpus broadcast — this is the
    * CORRECTNESS BASELINE for `lshPairs`/IVF, NOT a scale path. Never run
    * it above ~10⁵ rows: at corpus scale both the broadcast and the pair
    * count explode. The `maxRows` guard makes the footgun explicit —
    * raise it only for a deliberate offline baseline run.
    */
  def bruteForcePairs(corpus: DataFrame, threshold: Double,
                      maxRows: Long = 100000L): DataFrame = {
    // bound the guard's own scan: limit(maxRows+1) answers "more than
    // maxRows?" without a full pass over a derived/filtered corpus
    val probe = math.min(maxRows, Int.MaxValue - 2L).toInt
    val n = corpus.limit(probe + 1).count()
    require(n <= maxRows,
      s"bruteForcePairs is the O(n²) exact baseline: corpus has > maxRows=$maxRows rows. " +
        "Use lshPairs/IvfSearch at scale, or raise maxRows explicitly for an offline baseline.")
    val a = corpus.select(col("vec_id").as("vec_a"),
      VectorFns.unitVector(col("embedding")).as("va"))
    val b = corpus.select(col("vec_id").as("vec_b"),
      VectorFns.unitVector(col("embedding")).as("vb"))
    a.crossJoin(broadcast(b)).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFns.dotPre(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** SRP-LSH signature index: (vec_id, uv, band, bv) — the banded
    * random-hyperplane signatures every LSH query joins against. This is
    * the materialize-once artifact of the LSH family (a deployment
    * persists it next to the corpus); `lshPairsFromIndex` consumes it.
    */
  def srpIndex(corpus: DataFrame, bits: Int = 12, bands: Int = 8,
               dimOverride: Int = -1): DataFrame = {
    // hyperplanes must span the FULL vector: a too-short plane would
    // silently sign only a prefix (ArrayDot stops at min length) and
    // quietly wreck recall — infer the dimension from the data.
    val dim = inferDim(corpus, dimOverride)
    val unit = corpus.select(col("vec_id"),
      VectorFns.unitVector(col("embedding")).as("uv"))
    val sigCols = (0 until bands).map { bd =>
      struct(lit(bd).as("band"),
        VectorFns.srpSignatureOffset(col("uv"), bits, bd * bits, dim).as("bv"))
    }
    unit
      .select(col("vec_id"), col("uv"), explode(array(sigCols: _*)).as("bk"))
      .select(col("vec_id"), col("uv"), col("bk.band"), col("bk.bv"))
  }

  /** Approximate near-dup pairs via SRP-LSH: vectors sharing a `bits`-bit
    * random-hyperplane signature band become candidates, verified with
    * exact cosine. Recall < 1 (trades scan cost for completeness); at
    * 100 TB the bucket join replaces the O(n²) cross join.
    */
  def lshPairs(corpus: DataFrame, threshold: Double,
               bits: Int = 12, bands: Int = 8, dimOverride: Int = -1): DataFrame =
    lshPairsFromIndex(srpIndex(corpus, bits, bands, dimOverride), threshold)

  /** Pair mining against a pre-materialized `srpIndex` — the entry point
    * when the signature table is persisted (as a pipeline would).
    */
  def lshPairsFromIndex(banded: DataFrame, threshold: Double): DataFrame = {
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorFns.dotPre(col("a.uv"), col("b.uv")).as("cosine"))
      .groupBy("vec_a", "vec_b").agg(first("cosine").as("cosine")) // dedup multi-band hits
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** 1-bit binary quantization: each vector collapses to its SIGN
    * PATTERN, packed 32 bits per long — (vec_id, sig: array<long>) with
    * ceil(dim/32) words. Bit i of word w is set iff
    * embedding[w*32+i] > 0 (positive scaling never flips a sign, so no
    * normalization is needed). 32-bit words, not 64: engines that check
    * shift overflow refuse `1 << 63` on a signed 64-bit lane, and the
    * packing must replay bit-for-bit in the oracle — one extra
    * `bit_count` per pair buys exact cross-engine replayability.
    *
    * This is the serving tier BELOW SQ8/PQ: dim 64 floats (256 B)
    * become 8 B — 32x — and distance is XOR+popcount, fully inside
    * whole-stage codegen with no lookup tables at all.
    */
  def signPack(corpus: DataFrame, dimOverride: Int = -1): DataFrame = {
    val dim = inferDim(corpus, dimOverride)
    val nwords = (dim + 31) / 32
    corpus.select(col("vec_id"), expr(
      s"""transform(sequence(0, ${nwords - 1}), w ->
         |  aggregate(sequence(0, 31), 0L, (acc, i) ->
         |    acc | IF(w * 32 + i < $dim,
         |             IF(element_at(embedding, w * 32 + i + 1) > CAST(0.0 AS FLOAT),
         |                shiftleft(1L, i), 0L),
         |             0L)))""".stripMargin).as("sig"))
  }

  /** Hamming distance between two packed sign signatures (bit
    * difference count): per-word XOR + popcount, summed. An integer —
    * ranking by it is exactly replayable, no float-tie hazard.
    */
  def hammingDist(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h).cast("long")

  /** Exact top-k by SIGNATURE Hamming distance for each query: the
    * binary-quantized retrieval tier. One scan of the packed corpus
    * (8 B/vector at dim 64) against broadcast query signatures;
    * deterministic integer ranking (hamming asc, neighbor_id asc) means
    * the WHOLE result is engine-exact — unlike the cosine tiers, the
    * gate needs no float-gap argument.
    */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                  dimOverride: Int = -1): DataFrame = {
    // infer the dimension ONCE, from the corpus, and pin both packings
    // to it: two independent probes would cost a duplicate job and
    // could disagree on ragged inputs, silently nulling distances
    // through zip_with padding
    val dim = inferDim(corpus, dimOverride)
    val c = signPack(corpus, dim)
      .select(col("vec_id").as("neighbor_id"), col("sig").as("csig"))
    val q = signPack(queries, dim)
      .select(col("vec_id").as("query_id"), col("sig").as("qsig"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", hammingDist(col("qsig"), col("csig")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "hamming", "rk")
  }

  /** Binary-quantized retrieval with exact re-rank: Hamming shortlist
    * of `shortlist` candidates from the packed scan, then exact cosine
    * over raw vectors for just those — the standard deployment shape
    * (cheap 32x-compressed first pass, constant-size exact second
    * pass). Returns the bruteForceTopK schema.
    */
  def hammingRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        shortlist: Int = 64, dimOverride: Int = -1): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val cand = hammingTopK(corpus, queries, shortlist, dimOverride)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col("vec_id").as("query_id"),
      VectorFns.unitVector(col("embedding")).as("qv"))
    // r20 rerank shape (guide §3.1, the IvfSearch discipline): the
    // candidate×query side is bounded (≤ |queries|·shortlist rows) —
    // broadcast IT and stream the corpus, normalizing only matched
    // rows, instead of letting the planner build the whole normalized
    // corpus into a broadcast relation.
    val scored = broadcast(cand.join(broadcast(qv), "query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__emb")), Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFns.dotPre(col("qv"), VectorFns.unitVector(col("__emb"))))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rk")
  }
}
