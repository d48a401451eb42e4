package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval over a persisted inverted index (q173's operator).
  *
  * The index artifact is the FULL (uncapped) posting-list table
  * (doc_id, token, tf, len) plus two control-plane scalars
  * (N = corpus docs, L = total tokens). A deployment persists the table
  * next to the corpus and keeps N/L as catalog statistics; scoring never
  * re-tokenizes.
  *
  * Exactness discipline (shared with q76/q86): ln is not cross-engine
  * bit-stable, so idf is a FIXED-POINT log2 in pure integer arithmetic —
  * Robertson's ln((N-df+0.5)/(df+0.5)+1) = ln((N+1)/(df+0.5)), and
  * milli_log2(x) for x = (2N+2)*1024 div (2df+1) is
  * (bitlen(x)-1)*1000 + a linear-interpolation fraction from one shift.
  * The variant is monotone in the true idf with a certified error band
  * of [0, 87] milli-bits (Bm25Spec), and makes every score an exact
  * BIGINT both engines agree on bitwise.
  *
  * Scale shape: term filters push into the index scan, the per-query idf
  * table (|terms| rows) broadcasts, scoring is one map-side-combinable
  * aggregation keyed on doc_id, and top-k is TakeOrderedAndProject
  * (per-partition heaps) — never a global sort.
  */
object Bm25 {

  /** The index artifact. `tfLen` is NOT persisted by [[build]] — the
    * caller owns the storage lifecycle (the query layer memoizes and
    * releases it like every other index artifact). `unicode` records the
    * tokenizer mode the posting table was built with: ONE token space
    * per index — [[append]] enforces it (mixing modes would silently
    * blend two token spaces into one posting table and skew every
    * df/idf with no error).
    */
  final case class Index(tfLen: DataFrame, nDocs: Long, totalTokens: Long,
                         unicode: Boolean = false)

  /** (doc_id, token) stream. Default: lowercase ASCII letter runs — the
    * q76 tokenization, shared so corpus artifacts agree. `unicode = true`
    * switches to the codepoint-class segmenter
    * ([[graft.functions.UniTok]]): CJK unigrams + accented-Latin/Greek/
    * Cyrillic runs, the tier a multilingual corpus needs (ASCII split
    * yields an EMPTY token stream on CJK text, which silently drops
    * those documents from the index). One tokenizer per index — an
    * index built with one mode must be queried/appended with the same
    * mode ([[Index.unicode]] records it and [[append]] enforces it;
    * [[topk]] takes pre-tokenized terms, so term tokenization stays the
    * caller's responsibility).
    */
  def tokenize(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", unicode: Boolean = false): DataFrame = {
    val tok =
      if (unicode) graft.functions.UniTokenize(col(textCol))
      else split(lower(col(textCol)), "[^a-z]+")
    docs.select(col(idCol).as("doc_id"), explode(tok).as("token"))
      .filter(col("token") =!= "")
  }

  /** Build the index from a document table: tf per (doc, token), per-doc
    * token length folded in via a doc-partitioned window (group size =
    * the doc's distinct tokens, never the corpus), scalars from one
    * count + one aggregation.
    *
    * `prepareTfLen` runs on the posting table BEFORE the `totalTokens`
    * action — the persist hook: a caller that keeps the index should pass
    * `_.persist(...)` so the tokenize scan runs once (the query layer's
    * memoizing cache does exactly this; keeping the hook here means the
    * index-construction logic exists in ONE place instead of a drifting
    * inline copy).
    *
    * ID-uniqueness contract: the CALLER owns within-batch `doc_id`
    * uniqueness — a duplicated id double-counts df and totalTokens and
    * silently skews every idf, the same corruption the append overlap
    * probe guards across batches. Pass `probeDuplicateIds = true` for
    * untrusted input to turn a violation into an error naming the
    * offender (cost: one extra aggregation action over the input docs).
    */
  def build(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            prepareTfLen: DataFrame => DataFrame = identity,
            probeDuplicateIds: Boolean = false,
            unicode: Boolean = false): Index = {
    if (probeDuplicateIds) {
      val dup = docs.groupBy(col(idCol)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"Bm25.build input duplicates $idCol=${dup.headOption.map(_.get(0)).orNull}: " +
          "a duplicated doc id double-counts df/L and skews every idf")
    }
    val tf = tokenize(docs, idCol, textCol, unicode)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tfLen = prepareTfLen(tf.withColumn("len",
      sum(col("tf")).over(Window.partitionBy(col("doc_id")))))
    val n = docs.count()
    val l = tfLen.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    Index(tfLen, n, l, unicode)
  }

  /** Index artifact format version — bumped on ANY layout change so a
    * stale reader or writer fails by name.
    */
  val ArtifactVersion = 1

  /** Persist an [[Index]] as a manifest-gated artifact directory (the
    * [[ArtifactStore]] discipline shared with [[AnnArtifact]]): the
    * posting table as parquet, the control-plane scalars (N, L) and the
    * TOKENIZER MODE in the manifest, manifest written LAST. Recording
    * `unicode` is the load-bearing part: an index rebuilt into a session
    * without it would default the mode and [[append]]'s one-token-space
    * guard would either block valid appends or admit a silent blend.
    */
  def saveIndex(idx: Index, dir: String): Unit =
    ArtifactStore.commit(dir, "graft-bm25", ArtifactVersion,
      Seq("tf_len" -> idx.tfLen)) { node =>
      node.put("n_docs", idx.nDocs)
      node.put("total_tokens", idx.totalTokens)
      node.put("unicode", idx.unicode)
    }

  /** Load a [[saveIndex]] artifact, verifying version, the posting
    * table's commit marker + schema, and scalar presence before
    * returning — loud-at-load, like every artifact leg. The posting
    * frame is a lazy parquet read; loading ships no data, and a
    * deployment serves months of [[topk]]/[[append]] calls from it
    * without re-tokenizing a byte of the corpus.
    */
  def loadIndex(spark: SparkSession, dir: String): Index = {
    val m = ArtifactStore.manifest(dir, "graft-bm25", ArtifactVersion,
      "BM25 index")
    val tfLen = ArtifactStore.table(spark, dir, m, "tf_len").getOrElse(
      throw new IllegalArgumentException(
        s"$dir: manifest lists no 'tf_len' table — not a BM25 index"))
    require(m.hasNonNull("n_docs") && m.hasNonNull("total_tokens") &&
      m.hasNonNull("unicode"),
      s"$dir: manifest is missing the control-plane scalars (n_docs / " +
        "total_tokens / unicode) — a skewed or hand-edited artifact")
    Index(tfLen, m.path("n_docs").asLong(), m.path("total_tokens").asLong(),
      m.path("unicode").asBoolean())
  }

  /** Incremental maintenance: extend the index with a NEW batch of docs
    * (ids disjoint from the corpus — the jaccardPairsAgainst contract).
    * The posting-union itself is O(batch): the corpus posting rows are
    * reused untouched and the scalars are additive. Retrieval over the
    * appended index equals a from-scratch rebuild EXACTLY (spec-pinned):
    * df/idf are derived at query time from the posting rows, so new
    * documents shift idf with no stored-weight staleness — the failure
    * mode of systems that bake idf into the index at build time.
    *
    * PROBE COST (`probeOverlap`, default on): the disjointness probe is
    * an eager semi-join action whose corpus side is `idx.tfLen` — cheap
    * (one cached-block scan) when the caller persisted the posting table
    * (the memoizing query layer does), but a FULL re-tokenize of the
    * corpus lineage when `tfLen` is unpersisted. Callers that guarantee
    * disjoint ids by construction (e.g. a monotone ingest sequence
    * number) may pass `probeOverlap = false` to keep the append strictly
    * O(batch): what remains are the BATCH-sized eager actions (the
    * batch duplicate-id probe, which is not optional — it guards the
    * same corruption — plus build's nDocs count and totalTokens
    * aggregation), i.e. a few small Spark jobs per append, never a
    * corpus scan.
    */
  def append(idx: Index, newDocs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", probeOverlap: Boolean = true,
             unicode: Boolean = false): Index = {
    // tokenizer-mode contract is ENFORCED, not just documented: an index
    // built with one mode appended with the other mixes two token spaces
    // in one posting table (df/idf silently skewed, no error otherwise)
    require(idx.unicode == unicode,
      s"Bm25.append tokenizer mode mismatch: index built with unicode=${idx.unicode}, " +
        s"append called with unicode=$unicode — one token space per index")
    // the arriving batch is small by definition — always probe it for
    // duplicate ids (a dup inside the batch is the same idf corruption
    // the cross-batch overlap probe exists for)
    val add = build(newDocs, idCol, textCol, probeDuplicateIds = true,
      unicode = unicode)
    if (probeOverlap) {
      // loud disjointness probe: an overlapping doc would double-count in
      // df and totalTokens and SILENTLY skew every idf — one semi-join
      // over the batch's ids turns the contract violation into an error
      // naming the offender instead (cost: see scaladoc)
      val overlap = add.tfLen.select(col("doc_id")).distinct()
        .join(idx.tfLen.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        .limit(1).collect()
      require(overlap.isEmpty,
        s"Bm25.append batch overlaps the corpus (e.g. doc_id=${overlap.headOption.map(_.get(0)).orNull}): " +
          "append requires disjoint ids — overlapping docs would double-count df/L and skew every idf")
    }
    Index(idx.tfLen.unionByName(add.tfLen),
      idx.nDocs + add.nDocs, idx.totalTokens + add.totalTokens, unicode)
  }

  /** Top-`k` docs for `terms` by exact-integer BM25 (k1=1.2, b=0.75),
    * ties broken by doc_id. Output: (doc_id, score, n_terms).
    *
    * Per-row arithmetic is L-free so it CANNOT overflow at corpus
    * scale: the length normalization uses r_milli = len·1000 div
    * avgTok with avgTok = L div N precomputed as one integer scalar —
    * a formulation multiplying by L itself (idf·22·tf·L div
    * (10·L·tf + 3L + 9·len·N)) overflows int64 near L ≈ 10^10 tokens,
    * three orders below a 100 TB corpus. With the rescaled form the
    * largest product is idf_milli·22000·tf: safe for tf up to ~4×10^9
    * occurrences of one term in one document, beyond any real doc.
    * The avgTok floor and the r_milli floor are two documented
    * fixed-point roundings, identical in both engines (integer div).
    */
  def topk(idx: Index, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(idx.nDocs > 0 && idx.totalTokens >= idx.nDocs,
      s"degenerate index (nDocs=${idx.nDocs}, totalTokens=${idx.totalTokens}): " +
        "average document length must be >= 1 token")
    val n = idx.nDocs
    val avgTok = idx.totalTokens / n
    val hits = idx.tfLen.filter(col("token").isin(terms: _*))
    val idf = hits.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("x", expr(s"(${2 * n + 2}L * 1024L) div (2L * df + 1L)"))
      .select(col("token"), expr(
        "(length(bin(x)) - 1) * 1000" +
          " + shiftright(x * 1000L, length(bin(x)) - 1) - 11000").as("idf_milli"))
    hits.join(broadcast(idf), "token")
      .select(col("doc_id"), expr(
        s"(idf_milli * 22000L * tf)" +
          s" div (10000L * tf + 3000L + 9L * ((len * 1000L) div ${avgTok}L))").as("contrib"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
