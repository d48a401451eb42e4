package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BitmapDistinct
import graft.multimodal.{Multimodal, Phash}

/** Round-6 widening: weighted similarity join, table reconciliation,
  * SCD Type-2 history build, higher-order array functions, argmax/argmin,
  * exact bitmap distinct, and the codec→dedup bridge (perceptual hash).
  *
  * Shared discipline with the other registries: deterministic ORDER BY,
  * integer/decimal-exact aggregation with double casts only in a fixed
  * finishing sequence, identical column aliases on both engines.
  */
object AnalyticsQueries {

  // pHash fingerprint table per (session, dir): decode+hash is the
  // materialize-once offline artifact (like the dedup/SRP/IVF indexes —
  // a deployment persists fingerprints next to the media, not re-decodes
  // per query); pair mining joins against it.
  private val phashCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def phashFingerprints(s: SparkSession, d: String): DataFrame =
    synchronized {
      phashCache.getOrElseUpdate((s, d), {
        implicit val sp: SparkSession = s
        Phash.fingerprints(Multimodal.bmpFromDocuments(Tables.documents(s, d)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
    }

  // df-capped tf posting lists per (session, dir) — q76's index artifact.
  // A deployment persists the pruned inverted index next to the corpus;
  // rebuilding the tokenize+count+cap prefix on every query would scan
  // the text column three times per run at 100 TB.
  private val tfCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def keptTf(s: SparkSession, d: String): DataFrame = synchronized {
    tfCache.getOrElseUpdate((s, d), {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val dfCap = docs.count() / 10
      val tok = docs
        .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("token"))
        .filter($"token" =!= "")
        .groupBy($"doc_id", $"token")
        .agg(count(lit(1)).as("tf"))
      val rare = tok.groupBy($"token").agg(count(lit(1)).as("df"))
        .filter($"df" <= dfCap).select($"token")
      tok.join(rare, "token")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  // canonical part co-occurrence edges per (session, dir) — the graph
  // q83 (triangles) and q86 (PageRank) both query; materialized once
  // like any graph system's edge table.
  private val graphCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def coEdges(s: SparkSession, d: String): DataFrame = synchronized {
    graphCache.getOrElseUpdate((s, d), {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .filter($"l_partkey" % 4 === 0)
        .select($"l_orderkey", $"l_partkey")
      val edges = li.as("a")
        .join(li.as("b"),
          $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
        .select($"a.l_partkey".as("u"), $"b.l_partkey".as("v"))
        .distinct()
      // persist WIDE (r19): the distinct's AQE-coalesced output is ~1
      // small partition, so q83's wedge generation (Σ outdeg² rows) and
      // q86's per-iteration joins ran single-threaded off the cache
      edges.repartition(graft.operators.Scatter.cores(s), $"u", $"v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  // degree table of the co-occurrence graph per (session, dir) — the
  // per-iteration join side of q86's PageRank. Memoized (and released via
  // clearCaches) like coEdges: it was previously persisted per invocation
  // and never unpersisted, so bench reps accumulated orphaned RDDs in the
  // block manager.
  private val degCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def coDegrees(s: SparkSession, d: String): DataFrame = synchronized {
    degCache.getOrElseUpdate((s, d), {
      graft.operators.PageRank.degrees(graft.operators.PageRank.bothWays(coEdges(s, d)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  // BFS level table per (session, dir) — the operator consolidates its
  // result into ONE checkpoint leaf and frees its per-round frontiers
  // before returning; memoized here and released (Lineage.release — a
  // checkpoint leaf is beyond unpersist's reach) in clearCaches.
  private val bfsCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def bfsLevels(s: SparkSession, d: String): DataFrame = synchronized {
    bfsCache.getOrElseUpdate((s, d), {
      import s.implicits._
      val ed = graft.operators.PageRank.bothWays(coEdges(s, d))
      // deterministic, scale-independent source: the smallest node id
      // present in the edge set (one driver scalar, like q88's bounds)
      val src = ed.agg(min($"u")).head().getLong(0)
      graft.operators.Bfs.levels(ed, src, 4)
    })
  }

  // weighted SSSP distance table per (session, dir) — q132's result over
  // the same co-occurrence graph, with deterministic id-derived weights.
  // Memoized and released (Lineage.release) like bfsCache: the result is
  // one checkpoint leaf.
  private val ssspCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def ssspDistances(s: SparkSession, d: String): DataFrame = synchronized {
    ssspCache.getOrElseUpdate((s, d), {
      import s.implicits._
      // integer weights derived from the endpoint ids — deterministic,
      // engine-independent, in [1, 9]
      val ed = graft.operators.PageRank.bothWays(coEdges(s, d))
        .withColumn("w", ($"u" + $"v") % 9 + 1)
      val src = ed.agg(min($"u")).head().getLong(0)
      graft.operators.Sssp.distances(ed, src, maxCost = 16L)
    })
  }

  private[queries] def clearCaches(): Unit = synchronized {
    phashCache.values.foreach(_.unpersist())
    phashCache.clear()
    tfCache.values.foreach(_.unpersist())
    tfCache.clear()
    graphCache.values.foreach(_.unpersist())
    graphCache.clear()
    degCache.values.foreach(_.unpersist())
    degCache.clear()
    bfsCache.values.foreach(graft.operators.Lineage.release)
    bfsCache.clear()
    ssspCache.values.foreach(graft.operators.Lineage.release)
    ssspCache.clear()
    kcoreCache.values.foreach(graft.operators.Lineage.release)
    kcoreCache.clear()
    bm25Cache.values.foreach(_.tfLen.unpersist())
    bm25Cache.clear()
  }

  // 20-core of the co-occurrence graph per (session, dir) — q142's
  // result; memoized and released (Lineage.release) like bfsCache: the
  // peel loop's output is one checkpoint leaf.
  private val kcoreCache = scala.collection.mutable.Map
    .empty[(SparkSession, String), DataFrame]
  private def kcoreMembers(s: SparkSession, d: String): DataFrame = synchronized {
    kcoreCache.getOrElseUpdate((s, d), {
      graft.operators.KCore.kCore(
        graft.operators.PageRank.bothWays(coEdges(s, d)), k = 20)
    })
  }

  // BM25 retrieval index per (session, dir) — `operators/Bm25.build`
  // over documents, the posting table persisted here (same artifact
  // discipline as keptTf: a deployment keeps the inverted index + doc
  // lengths next to the corpus, N/L as catalog statistics). The persist
  // lands BEFORE build's totalTokens action, so the tokenize scan runs
  // once. `Bm25.append` is the incremental-maintenance path
  // (spec-pinned equal to a rebuild).
  private val bm25Cache = scala.collection.mutable.Map
    .empty[(SparkSession, String), graft.operators.Bm25.Index]
  private def bm25Index(s: SparkSession, d: String): graft.operators.Bm25.Index =
    synchronized {
      bm25Cache.getOrElseUpdate((s, d),
        // ONE copy of the index-construction logic: the persist lands via
        // build's prepareTfLen hook, before its totalTokens action, so
        // the tokenize scan runs once and nothing here can drift from
        // the operator
        graft.operators.Bm25.build(Tables.documents(s, d), prepareTfLen =
          _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
    }

  /** Unrolled parallel-peel oracle for q142: level i keeps nodes with
    * ≥ k neighbors inside level i−1's induced subgraph. MATERIALIZED is
    * load-bearing — each level references its predecessor twice (both
    * join endpoints), and DuckDB inlines plain CTEs, which makes the
    * unrolled chain EXPONENTIAL (measured: 12 plain levels never
    * finished; materialized, milliseconds). The unroll depth carries a
    * wide margin over the measured convergence round (9 at sf0.01, 7 at
    * sf0.1); an under-unrolled oracle fails LOUDLY as a hash mismatch
    * because the final HAVING filter sees un-peeled degrees.
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head = s"""
      WITH el AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0),
      edges AS MATERIALIZED (SELECT u AS src, v AS dst FROM el UNION ALL SELECT v, u FROM el),
      k0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)"""
    val levels = (1 to rounds).map(i => s""",
      k$i AS MATERIALIZED (SELECT e.src AS node FROM edges e
        JOIN k${i - 1} a ON e.src = a.node JOIN k${i - 1} b ON e.dst = b.node
        GROUP BY e.src HAVING COUNT(*) >= $k)""").mkString
    head + levels + s"""
      SELECT e.src AS node, COUNT(*) AS deg
      FROM edges e JOIN k$rounds a ON e.src = a.node JOIN k$rounds b ON e.dst = b.node
      GROUP BY e.src HAVING COUNT(*) >= $k
      ORDER BY node"""
  }

  val queries: Seq[Q] = Seq(

    Q(
      "q76_tfidf_cosine",
      (s, d) => {
        import s.implicits._
        // Weighted (term-frequency) cosine similarity JOIN over documents —
        // the scored upgrade of q21's set-Jaccard. Candidates come from an
        // inverted-index self-join; the df <= N/10 cap prunes stop-token
        // posting lists FIRST, which is what bounds the candidate blowup:
        // join work is Σ df² over KEPT tokens <= (N/10)·Σdf — never
        // all-pairs, and the cap scales with the corpus instead of
        // silently emptying at 10× the docs (the fixed-cap failure mode).
        // The N scalar is one control-plane count, same class as IVF's
        // driver centroids. Dot products and norms are exact integers;
        // cosine = one fixed IEEE sequence (int→double, sqrt, mul, div)
        // so both engines agree bitwise.
        val kept = keptTf(s, d) // memoized posting-list index (see above)
        val norms = kept.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
        kept.as("a")
          .join(kept.as("b"),
            $"a.token" === $"b.token" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
          .agg(sum($"a.tf" * $"b.tf").as("dot"))
          .join(norms.select($"doc_id".as("doc_a"), $"n2".as("na")), "doc_a")
          .join(norms.select($"doc_id".as("doc_b"), $"n2".as("nb")), "doc_b")
          .select($"doc_a", $"doc_b", $"dot",
            ($"dot".cast("double") /
              (sqrt($"na".cast("double")) * sqrt($"nb".cast("double")))).as("cosine"))
          .filter($"cosine" >= 0.6)
          .orderBy($"doc_a", $"doc_b")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, t AS token, COUNT(*) AS tf
          FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
                FROM documents) u
          WHERE t <> ''
          GROUP BY doc_id, t
        ),
        kept AS (
          SELECT tok.* FROM tok
          JOIN (SELECT token FROM tok GROUP BY token
                HAVING COUNT(*) <= (SELECT COUNT(*) // 10 FROM documents)) f USING (token)
        ),
        norms AS (SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2 FROM kept GROUP BY doc_id)
        SELECT doc_a, doc_b, dot,
               CAST(dot AS DOUBLE) / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
        FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(SUM(a.tf*b.tf) AS BIGINT) AS dot
              FROM kept a JOIN kept b ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id) d
        JOIN norms na ON d.doc_a = na.doc_id
        JOIN norms nb ON d.doc_b = nb.doc_id
        WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) >= 0.6
        ORDER BY doc_a, doc_b"""),
      doc = "TF-weighted cosine similarity join via a df-capped inverted index: stop-token posting lists pruned before the self-join bound candidates at (N/10)·Σdf; integer dot/norms make the double cosine bit-identical cross-engine."),

    Q(
      "q173_bm25_topk",
      (s, d) =>
        // BM25 top-k retrieval — the ranking stage every
        // retrieval-augmented data pipeline runs after candidate
        // generation. The whole design (fixed-point integer log2 idf
        // with a certified error band, per-query idf broadcast, term
        // pushdown into the index scan, TakeOrderedAndProject top-k)
        // lives in operators/Bm25; the oracle replays the identical
        // integer formula with bitlen via PRINTF('%b').
        graft.operators.Bm25.topk(
          bm25Index(s, d), Seq("dup", "spark", "window"), 20),
      Some("""
        WITH tok AS (
          SELECT doc_id, t AS token
          FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
                FROM documents) u
          WHERE t <> ''
        ),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        len AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
        nl AS (SELECT (SELECT COUNT(*) FROM documents) AS n, (SELECT COUNT(*) FROM tok) AS l),
        hits AS (SELECT * FROM tf WHERE token IN ('dup', 'spark', 'window')),
        dfs AS (SELECT token, COUNT(*) AS df FROM hits GROUP BY token),
        idf AS (
          SELECT token,
                 (LENGTH(PRINTF('%b', x)) - 1) * 1000
                   + ((x * 1000) >> (LENGTH(PRINTF('%b', x)) - 1)) - 11000 AS idf_milli
          FROM (SELECT token, (2 * n + 2) * 1024 // (2 * df + 1) AS x FROM dfs, nl) q
        )
        SELECT h.doc_id,
               CAST(SUM((i.idf_milli * 22000 * h.tf)
                 // (10000 * h.tf + 3000 + 9 * ((le.len * 1000) // (nl.l // nl.n)))) AS BIGINT) AS score,
               COUNT(*) AS n_terms
        FROM hits h JOIN len le USING (doc_id) JOIN idf i USING (token), nl
        GROUP BY h.doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20"""),
      doc = "BM25 top-k retrieval (k1=1.2, b=0.75) over the persisted inverted index with a fixed-point integer log2 idf (bitlen + shift interpolation; ln((N+1)/(df+0.5)) identity): every score is an exact BIGINT so both engines agree bitwise, term filters push into the index scan, the 3-row idf table broadcasts, and top-k is per-partition heaps (TakeOrderedAndProject) — never a global sort."),

    Q(
      "q179_bm25_unicode",
      (s, _) => {   // multilingual fixture is SF-independent; dir arg unused
        // END-TO-END multilingual retrieval: the q173 integer-exact BM25
        // machinery over the q176 Unicode tokenizer — a CJK unigram, a
        // Cyrillic run, and an accented-Latin run retrieve from ONE
        // index with bitwise-identical BIGINT scores in both engines
        // (the tokenizer row pins segmentation; THIS row pins that the
        // whole retrieval stack composes over it). Index build is
        // per-call: the fixture is 40 docs.
        val docs = s.read.parquet(TextQueries.UniFixture.ensure(s))
        graft.operators.Bm25.topk(
          graft.operators.Bm25.build(docs, textCol = "txt", unicode = true),
          Seq("数", "данных", "café"), 20)
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, t AS token
          FROM (SELECT doc_id,
                       UNNEST(REGEXP_EXTRACT_ALL(LOWER(txt), '${graft.functions.UniTok.oracleRegex}')) AS t
                FROM read_parquet('${TextQueries.UniFixture.Root}/*.parquet')) u
          WHERE t <> ''
        ),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        len AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY doc_id),
        nl AS (SELECT (SELECT COUNT(*) FROM read_parquet('${TextQueries.UniFixture.Root}/*.parquet')) AS n,
                      (SELECT COUNT(*) FROM tok) AS l),
        hits AS (SELECT * FROM tf WHERE token IN ('数', 'данных', 'café')),
        dfs AS (SELECT token, COUNT(*) AS df FROM hits GROUP BY token),
        idf AS (
          SELECT token,
                 (LENGTH(PRINTF('%b', x)) - 1) * 1000
                   + ((x * 1000) >> (LENGTH(PRINTF('%b', x)) - 1)) - 11000 AS idf_milli
          FROM (SELECT token, (2 * n + 2) * 1024 // (2 * df + 1) AS x FROM dfs, nl) q
        )
        SELECT h.doc_id,
               CAST(SUM((i.idf_milli * 22000 * h.tf)
                 // (10000 * h.tf + 3000 + 9 * ((le.len * 1000) // (nl.l // nl.n)))) AS BIGINT) AS score,
               COUNT(*) AS n_terms
        FROM hits h JOIN len le USING (doc_id) JOIN idf i USING (token), nl
        GROUP BY h.doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20"""),
      doc = "Multilingual BM25 end-to-end: the q173 integer-exact retrieval stack composed over the q176 Unicode tokenizer — CJK unigram + Cyrillic run + accented-Latin run query terms rank documents of the committed multilingual fixture with bitwise-identical BIGINT scores; DuckDB replays BOTH the generated segmentation regex AND the fixed-point idf/score formula."),

    Q(
      "q77_table_diff",
      (s, d) => {
        import s.implicits._
        // Reconciliation of two 100 TB tables WITHOUT a row-level join:
        // each side collapses to 256 bucket digests (count + exact integer
        // fingerprint sum — commutative, so partition order can't matter),
        // and only the tiny digest tables meet. Mismatched buckets name
        // exactly where to drill down; matched buckets need no further IO.
        // The "other" table is derived in-query (keys %97 perturbed,
        // keys %101 deleted) so both engines see identical inputs.
        // Per-row fingerprints are MOD-REDUCED (< 1e9+7) so the bucket
        // SUM stays int64-exact to ~9e9 rows per bucket at any key
        // magnitude — the unreduced key*1000003 form made the sum
        // overflow (ANSI throw here, silent HUGEINT promotion in DuckDB
        // — a cross-engine divergence) on billion-row buckets; more
        // buckets is the knob beyond that. Checksum semantics: a
        // same-bucket collision needs key deltas ≡ 0 (mod 1e9+7).
        val o = Tables.orders(s, d).select(
          $"o_orderkey",
          ($"o_orderkey" % 256).as("bucket"),
          ((($"o_orderkey" % 1000000007L) * 1000003L
            + round($"o_totalprice" * 100).cast("long")) % 1000000007L).as("fp"))
        val a = o.groupBy($"bucket")
          .agg(count(lit(1)).as("n_a"), sum($"fp").as("s_a"))
        val b = o.filter($"o_orderkey" % 101 =!= 0)
          .select($"bucket",
            ($"fp" + when($"o_orderkey" % 97 === 0, 1L).otherwise(0L)).as("fp"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_b"), sum($"fp").as("s_b"))
        a.join(b, Seq("bucket"), "full_outer")
          .select($"bucket",
            coalesce($"n_a", lit(0L)).as("n_a"), coalesce($"n_b", lit(0L)).as("n_b"),
            coalesce($"s_a", lit(0L)).as("s_a"), coalesce($"s_b", lit(0L)).as("s_b"))
          .filter($"n_a" =!= $"n_b" || $"s_a" =!= $"s_b")
          .orderBy($"bucket")
      },
      Some("""
        WITH src AS (
          SELECT o_orderkey,
                 o_orderkey % 256 AS bucket,
                 ((o_orderkey % 1000000007) * 1000003 + CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) % 1000000007 AS fp
          FROM orders
        ),
        a AS (SELECT bucket, COUNT(*) AS n_a, CAST(SUM(fp) AS BIGINT) AS s_a
              FROM src GROUP BY bucket),
        b AS (SELECT bucket, COUNT(*) AS n_b, CAST(SUM(fp) AS BIGINT) AS s_b
              FROM (SELECT bucket,
                           fp + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS fp
                    FROM src WHERE o_orderkey % 101 <> 0) v
              GROUP BY bucket)
        SELECT bucket,
               COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
               COALESCE(s_a, 0) AS s_a, COALESCE(s_b, 0) AS s_b
        FROM a FULL JOIN b USING (bucket)
        WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0) OR COALESCE(s_a, 0) <> COALESCE(s_b, 0)
        ORDER BY bucket"""),
      doc = "Table reconciliation by bucket digest: two scans collapse to 256 (count, Σfingerprint) digests each, no row-level join; mismatched buckets localize the diff — the anti-entropy pattern for verifying 100 TB copies. Fingerprints mod-reduced so bucket sums stay int64-exact to ~9e9 rows/bucket."),

    Q(
      "q78_scd2_history",
      (s, d) => {
        import s.implicits._
        // SCD Type-2 dimension build from a change log — the warehouse
        // operator behind the reference lake's monthly ref_date versions:
        // collapse each customer's observed attribute sequence into
        // non-overlapping validity intervals [eff_from, eff_to), open
        // interval coalesced to the 9999-12-31 sentinel (no null cells in
        // the gate output). Snapshot semantics first: the LAST observation
        // per (key, date) wins — two same-date observations must not mint
        // a zero-length interval. Three window passes partitioned by the
        // key and one grouped agg — no self-join, no driver state; each
        // customer's history lives in one partition's sort run.
        // ONE key exchange serves the whole chain (guide §2.4 "two
        // operations keyed the same way can share one exchange"): the
        // snapshot window needs clustering on (custkey, orderdate), which
        // hash(custkey) already provides, and every later window and the
        // group-by are custkey-clustered too — without the explicit
        // repartition the planner exchanges on (custkey, orderdate) first
        // and again on custkey (3 exchanges → 2).
        val wd = Window.partitionBy($"o_custkey", $"o_orderdate").orderBy($"o_orderkey".desc)
        val daily = Tables.orders(s, d)
          .select($"o_custkey", $"o_orderpriority", $"o_orderdate", $"o_orderkey")
          .repartition($"o_custkey")
          .withColumn("rn", row_number().over(wd))
          .filter($"rn" === 1)
          .drop("rn")
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate")
        val versioned = daily
          .withColumn("chg",
            when(lag($"o_orderpriority", 1).over(w) === $"o_orderpriority", 0L).otherwise(1L))
          .withColumn("version", sum($"chg").over(w))
        val grouped = versioned
          .groupBy($"o_custkey", $"version", $"o_orderpriority")
          .agg(min($"o_orderdate").as("eff_from_ts"), count(lit(1)).as("n_obs"))
        val wv = Window.partitionBy($"o_custkey").orderBy($"version")
        grouped
          .select($"o_custkey", $"version", $"o_orderpriority".as("priority"),
            date_format($"eff_from_ts", "yyyy-MM-dd HH:mm:ss").as("eff_from"),
            coalesce(date_format(lead($"eff_from_ts", 1).over(wv), "yyyy-MM-dd HH:mm:ss"),
              lit("9999-12-31 00:00:00")).as("eff_to"),
            $"n_obs",
            lead($"eff_from_ts", 1).over(wv).isNull.as("is_current"))
          .orderBy($"o_custkey", $"version")
      },
      Some("""
        WITH daily AS (
          SELECT o_custkey, o_orderpriority, o_orderdate
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                             ORDER BY o_orderkey DESC) AS rn
                FROM orders) r
          WHERE rn = 1
        ),
        h AS (
          SELECT o_custkey, o_orderpriority, o_orderdate,
                 CASE WHEN LAG(o_orderpriority) OVER w = o_orderpriority THEN 0 ELSE 1 END AS chg
          FROM daily
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        ),
        v AS (
          SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS version
          FROM h
        ),
        g AS (
          SELECT o_custkey, version, o_orderpriority AS priority,
                 MIN(o_orderdate) AS eff_from_ts, COUNT(*) AS n_obs
          FROM v GROUP BY o_custkey, version, o_orderpriority
        )
        SELECT o_custkey, version, priority,
               strftime(eff_from_ts, '%Y-%m-%d %H:%M:%S') AS eff_from,
               COALESCE(strftime(LEAD(eff_from_ts) OVER wv, '%Y-%m-%d %H:%M:%S'),
                        '9999-12-31 00:00:00') AS eff_to,
               n_obs,
               LEAD(eff_from_ts) OVER wv IS NULL AS is_current
        FROM g
        WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
        ORDER BY o_custkey, version"""),
      doc = "SCD Type-2 build: snapshot dedup (last observation per key+date) then lag-change detection + running version + lead close-off into non-overlapping validity intervals; key-partitioned window passes, zero joins."),

    Q(
      "q79_array_hof",
      (s, d) => {
        import s.implicits._
        // Higher-order array functions kept INSIDE codegen: per-order
        // sorted quantity vectors built once, then transform / filter /
        // aggregate lambdas run over the array without exploding it back
        // to rows — at 100 TB that's the difference between one shuffle
        // of packed arrays and re-shuffling every element. Integer math
        // throughout; the transformed array is emitted as a joined string
        // (determinism rule for array-valued outputs).
        Tables.lineitem(s, d)
          .filter($"l_orderkey" % 50 === 0)
          .select($"l_orderkey", round($"l_quantity" * 100).cast("long").as("qc"))
          .groupBy($"l_orderkey")
          .agg(array_sort(collect_list($"qc")).as("qs"))
          .select($"l_orderkey",
            concat_ws(",", transform($"qs", x => x * 2)).as("doubled"),
            aggregate(filter($"qs", _ > 2500L), lit(0L), (acc, x) => acc + x).as("big_sum"),
            size(filter($"qs", _ > 2500L)).cast("long").as("n_big"))
          .orderBy($"l_orderkey")
      },
      Some("""
        SELECT l_orderkey,
               array_to_string(list_transform(qs, x -> x * 2), ',') AS doubled,
               COALESCE(CAST(list_sum(list_filter(qs, x -> x > 2500)) AS BIGINT), 0) AS big_sum,
               CAST(length(list_filter(qs, x -> x > 2500)) AS BIGINT) AS n_big
        FROM (SELECT l_orderkey,
                     list(CAST(ROUND(l_quantity * 100, 0) AS BIGINT) ORDER BY CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS qs
              FROM lineitem
              WHERE l_orderkey % 50 = 0
              GROUP BY l_orderkey) g
        ORDER BY l_orderkey"""),
      doc = "Higher-order array functions (transform/filter/aggregate lambdas) over per-order packed vectors — array-local compute instead of explode+reshuffle; oracle uses DuckDB's list lambdas."),

    Q(
      "q80_argmax",
      (s, d) => {
        import s.implicits._
        // argmax/argmin as single-pass aggregates (max_by/min_by — no
        // self-join back to the max row, no window sort): WHICH part takes
        // the extreme price per return flag. Ties are impossible by
        // construction: the ordering key packs (price_cents, partkey) into
        // one bigint, so both engines pick the same row deterministically.
        val pc = round($"l_extendedprice" * 100).cast("long")
        Tables.lineitem(s, d)
          .select($"l_returnflag", $"l_partkey", (pc * 100000000L + $"l_partkey").as("key"), pc.as("pc"))
          .groupBy($"l_returnflag")
          .agg(
            max_by($"l_partkey", $"key").as("best_part"),
            min_by($"l_partkey", $"key").as("worst_part"),
            max($"pc").as("max_price_cents"),
            min($"pc").as("min_price_cents"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               arg_max(l_partkey, key) AS best_part,
               arg_min(l_partkey, key) AS worst_part,
               MAX(pc) AS max_price_cents,
               MIN(pc) AS min_price_cents
        FROM (SELECT l_returnflag, l_partkey,
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * 100000000 + l_partkey AS key,
                     CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS pc
              FROM lineitem) t
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      doc = "argmax/argmin via max_by/min_by with a packed tie-free ordering key — one aggregation pass instead of a window sort or a join-back-to-max."),

    Q(
      "q81_bitmap_distinct",
      (s, d) => {
        import s.implicits._
        // EXACT distinct users per event type through the paged-bitmap
        // aggregate — the exact sibling of q75's HLL. countDistinct plans
        // as Expand + double aggregation (shuffles one row per distinct
        // (group, value) pair); the bitmap absorbs duplicates map-side and
        // ships ~1 bit per distinct id, merging with bitwise OR. The
        // oracle is plain COUNT(DISTINCT): the bitmap must match it
        // exactly, which is the whole point.
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(BitmapDistinct($"user_id").as("n_users"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""),
      doc = "Exact COUNT DISTINCT via a paged-bitmap TypedImperativeAggregate (ClickHouse groupBitmap on Spark's aggregation frame): map-side dedup into set bits, OR-merge, ~1 bit per distinct id on the exchange — oracle-equal to COUNT(DISTINCT)."),

    Q(
      "q82_phash_neardup",
      (s, d) => {
        import s.implicits._
        // Codec→dedup bridge: decode every document's BMP rendering and
        // find near-duplicate IMAGES by 64-bit DCT perceptual hash —
        // robustness text dedup can't have (pHash survives brightness
        // shifts and pixel noise; PhashSpec pins both). Candidates come
        // from the same 4-band pigeonhole join as text SimHash; pixels
        // never shuffle, only (doc, fp) — memoized per dir like the other
        // index artifacts. No SQL oracle (DCT thresholding isn't
        // SQL-expressible): rows-only + PhashSpec.
        Phash.nearPairs(phashFingerprints(s, d), maxHamming = 3)
          .select($"doc_a", $"doc_b", $"hamming".cast("long").as("hamming"))
          .orderBy($"doc_a", $"doc_b")
      },
      None,
      doc = "Perceptual-hash (DCT pHash) image near-dup: decode + hash partition-local, 4x16-bit pigeonhole candidate join, exact hamming verify — the image-side SimHash; spec-pinned brightness invariance and noise tolerance."),

    Q(
      "q83_triangle_count",
      (s, d) => {
        import s.implicits._
        // Triangle counting over the part co-occurrence graph (parts in
        // the same order), with DEGREE-ORDERED ORIENTATION — the standard
        // trick that makes distributed triangle counting survive skew:
        // each edge is directed from its lower-(degree, id) endpoint, so
        // wedge generation is Σ outdeg² with outdeg ≤ O(√m) instead of
        // Σ deg² (a single celebrity node would otherwise emit deg² wedge
        // rows). Wedges close against the canonical edge set with one
        // equi-join. The oracle counts the same triangles with a naive
        // canonical triple join — same answer, different (non-scalable)
        // plan.
        val edges = coEdges(s, d) // memoized edge table (see above)
        // the undirected degree IS q86's memoized both-ways degree table
        // (each (u,v) edge counts once toward u and once toward v): reuse
        // it instead of re-aggregating a 2|E|-row union per execution
        val deg = coDegrees(s, d).select($"node", $"d".as("deg"))
        val oriented = edges
          .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
          .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
          .select(
            when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"u").otherwise($"v").as("src"),
            when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"), $"v").otherwise($"u").as("dst"))
        val wedges = oriented.as("x")
          .join(oriented.as("y"), $"x.src" === $"y.src" && $"x.dst" < $"y.dst")
          .select($"x.dst".as("u"), $"y.dst".as("v")) // canonical: id-ordered
        val tri = wedges.join(edges, Seq("u", "v"))
          .agg(count(lit(1)).as("n_triangles"))
        edges.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
          .orderBy($"n_edges")
      },
      Some("""
        WITH el AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0)
        SELECT (SELECT COUNT(*) FROM el) AS n_edges,
               (SELECT COUNT(*) FROM el e1
                  JOIN el e2 ON e2.u = e1.v
                  JOIN el e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
        ORDER BY 1"""),
      doc = "Distributed triangle counting with degree-ordered orientation: wedge work bounded by Σ outdeg² (outdeg ≤ O(√m)) instead of the skew-fatal Σ deg²; oracle recounts via a naive canonical triple join."),

    Q(
      "q84_heavy_hitters",
      (s, d) => {
        import s.implicits._
        // EXACT heavy hitters (tokens with global count ≥ total/500) in
        // two phases, ONE candidate scan: each partition counts locally,
        // emits its own total T_p as a marker row plus every token with
        // 500·c_p + 499 ≥ T_p. Pigeonhole against PER-PARTITION totals:
        // if 500·c_p + 499 < T_p on every partition then
        // n = Σc_p < (T − 499P)/500 ≤ ⌊T/500⌋ = thr, so recall is
        // exactly 1 with no distributional assumption — and unlike a
        // ceil(T/P) local threshold, no preliminary count of T is needed.
        // The emitted set is ≲ 500 rows per partition (each emitted count
        // is ≥ (T_p−499)/500 of its partition), so collecting it is a
        // bounded, labeled driver materialization like q87's bloom bytes;
        // the global total falls out of the same rows. One broadcast
        // semi-join then recounts candidates exactly. The token stream is
        // scanned twice total (was three times) and never key-shuffled.
        // (For unbounded key spaces the local map becomes a capacity-
        // bounded Space-Saving summary — materialized as
        // operators/SpaceSaving + q101; the corpus vocabulary here is
        // bounded, so a plain map is the honest choice.)
        val tok = Tables.documents(s, d)
          .select(explode(split(lower($"text"), "[^a-z]+")).as("token"))
          .filter($"token" =!= "")
        val localRows = tok.as[String].mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          var tot = 0L
          it.foreach { t => tot += 1L; m.update(t, m.getOrElse(t, 0L) + 1L) }
          // "" is the per-partition total marker: it cannot collide with a
          // token (empty strings are filtered out of the stream above)
          Iterator.single(("", tot)) ++
            m.iterator.collect { case (t, c) if 500L * c + 499L >= tot => (t, c) }
        }.collect()
        val total = localRows.collect { case ("", t) => t }.sum
        val thr = math.max(1L, total / 500)
        val candidates = localRows.collect { case (t, _) if t.nonEmpty => t }
          .distinct.toSeq.toDF("token")
        tok.join(broadcast(candidates), "token")
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .filter($"n" >= thr)
          .orderBy($"token")
      },
      Some("""
        WITH tok AS (
          SELECT t AS token FROM (
            SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t FROM documents) u
          WHERE t <> '')
        SELECT token, COUNT(*) AS n
        FROM tok GROUP BY token
        HAVING COUNT(*) >= GREATEST(1, (SELECT COUNT(*) // 500 FROM tok))
        ORDER BY token"""),
      doc = "Exact heavy hitters via pigeonhole two-phase: per-partition candidates at ceil(T/P) (recall exactly 1, no distribution assumption), broadcast semi-join, exact recount — the token stream itself is never key-shuffled."),

    Q(
      "q85_incremental_agg",
      (s, d) => {
        import s.implicits._
        // Incremental view maintenance: a materialized per-customer
        // aggregate of the OLD partition range merges with the DELTA's
        // aggregate — count/sum are commutative monoids, so merged state
        // must equal a full recompute (the oracle recomputes from
        // scratch). At 100 TB this is the difference between scanning
        // yesterday's 99.9% again and scanning only today's slice; same
        // algebra Spark uses internally for partial aggregation, here
        // surfaced as an operator with a FULL OUTER merge for keys that
        // exist on only one side.
        val split = lit("1999-01-01").cast("timestamp")
        val o = Tables.orders(s, d).select(
          $"o_custkey", $"o_orderdate",
          round($"o_totalprice" * 100).cast("long").as("pc"))
        def agg(df: DataFrame, n: String, sc: String) =
          df.groupBy($"o_custkey")
            .agg(count(lit(1)).as(n), sum($"pc").as(sc))
        val base = agg(o.filter($"o_orderdate" < split), "n_b", "s_b")
        val delta = agg(o.filter($"o_orderdate" >= split), "n_d", "s_d")
        base.join(delta, Seq("o_custkey"), "full_outer")
          .select($"o_custkey",
            (coalesce($"n_b", lit(0L)) + coalesce($"n_d", lit(0L))).as("n_orders"),
            (coalesce($"s_b", lit(0L)) + coalesce($"s_d", lit(0L))).as("revenue_cents"))
          .orderBy($"o_custkey")
      },
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey"""),
      doc = "Incremental aggregate maintenance: old-range materialized agg + delta agg merged with a FULL OUTER monoid merge — must equal the from-scratch recompute the oracle performs; only the delta slice is rescanned."),

    Q(
      "q86_pagerank",
      (s, d) => {
        import s.implicits._
        // Two PageRank iterations over the (undirected) part co-occurrence
        // graph in EXACT INTEGER arithmetic: ranks scaled by 10^12, every
        // division a floor division at the same point in the formula on
        // both engines — so the distributed Σ over in-neighbors is an
        // integer sum (order-independent) and the oracle matches bitwise,
        // which double-typed PageRank can never promise across engines or
        // parallelism. Each iteration = one join + one aggregation; the
        // rank vector (node, long) is all that flows between iterations —
        // the edge list is never rewritten. Floor losses bound total mass
        // drift below 1e-7 of S.
        val eu = coEdges(s, d) // memoized edge table, shared with q83
        val el = graft.operators.PageRank.bothWays(eu)
        val deg = coDegrees(s, d) // memoized degree table
        val n = deg.count() // control-plane scalar, one job over the tiny degree table
        val pr2 = graft.operators.PageRank.fixed(el, deg, n, iters = 2)
        pr2.select($"node", $"pr".as("pagerank_scaled")).orderBy($"node")
      },
      Some("""
        WITH eu AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0),
        el AS (SELECT u, v FROM eu UNION ALL SELECT v AS u, u AS v FROM eu),
        deg AS (SELECT u AS node, COUNT(*) AS d FROM el GROUP BY u),
        n AS (SELECT COUNT(*) AS n FROM deg),
        pr0 AS (SELECT node, 1000000000000 // (SELECT n FROM n) AS pr FROM deg),
        pr1 AS (
          SELECT el.v AS node,
                 (1000000000000 * 15) // (100 * (SELECT n FROM n))
                 + (85 * CAST(SUM(pr0.pr // deg.d) AS BIGINT)) // 100 AS pr
          FROM el JOIN pr0 ON el.u = pr0.node JOIN deg ON el.u = deg.node
          GROUP BY el.v),
        pr2 AS (
          SELECT el.v AS node,
                 (1000000000000 * 15) // (100 * (SELECT n FROM n))
                 + (85 * CAST(SUM(pr1.pr // deg.d) AS BIGINT)) // 100 AS pr
          FROM el JOIN pr1 ON el.u = pr1.node JOIN deg ON el.u = deg.node
          GROUP BY el.v)
        SELECT node, pr AS pagerank_scaled FROM pr2 ORDER BY node"""),
      doc = "PageRank (2 iterations, d=0.85) in exact scaled-integer arithmetic: floor divisions at identical formula points make the distributed in-neighbor sums order-independent and the oracle bitwise-equal — impossible with double ranks; per iteration one join + one agg, only the (node, rank) vector flows."),

    Q(
      "q87_bloom_semijoin",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.graft.Bridge
        import org.apache.spark.sql.types.BinaryType
        // EXPLICIT bloom-filter semi-join — the manual twin of the runtime
        // injection LayoutSpec pins: build a bloom over the small side's
        // join keys (one tiny agg), ship ~100 KB to every probe task as a
        // literal, and drop probe rows BEFORE the exact semi-join. At
        // 100 TB the prefilter kills the shuffle of rows that cannot
        // match; false positives are removed by the exact join that
        // follows, so the oracle (plain semi-join, no bloom) must match
        // exactly. Probe stays whole-stage-codegen (BloomFilterMightContain
        // has doGenCode).
        val keys = Tables.orders(s, d)
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey")
        val bf = keys.agg(Bridge.column(
            new BloomFilterAggregate(Bridge.expression(xxhash64($"o_orderkey")), 50000L)
              .toAggregateExpression()).as("bf"))
          .head().getAs[Array[Byte]](0)
        val prefiltered = Tables.lineitem(s, d)
          .filter(Bridge.column(BloomFilterMightContain(
            Literal(bf, BinaryType),
            Bridge.expression(xxhash64($"l_orderkey")))))
        prefiltered
          .join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_lines"),
            sum(($"l_extendedprice".cast("decimal(18,2)"))).cast("double").as("revenue"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      doc = "Explicit bloom-prefiltered semi-join: ~100 KB bloom literal drops non-matching probe rows before the exact semi-join (which removes false positives) — the shuffle-avoidance pattern for selective joins at 100 TB; oracle is the plain semi-join."),

    Q(
      "q88_equiheight_histogram",
      (s, d) => {
        import s.implicits._
        // Equi-height histogram — optimizer-statistics material: bucket
        // BOUNDS come from the distributed exact-percentile operator
        // (q35's bucketed rank selection, which never co-locates a group),
        // then one scan buckets rows against the three literal bounds.
        // Works because exactInterpolated is bit-equal to QUANTILE_CONT
        // (PercentilesSpec): identical double bounds + identical `<`
        // comparisons → identical bucket membership on both engines. The
        // bounds are 3 driver scalars, the same control-plane class as
        // IVF's centroids.
        val li = Tables.lineitem(s, d)
          .select(lit(1).as("g"), $"l_extendedprice",
            round($"l_extendedprice" * 100).cast("long").as("pc"))
        val b = graft.operators.Percentiles.exactInterpolated(
          li, "g", Seq(
            ("l_extendedprice", 0.25, "q1"),
            ("l_extendedprice", 0.50, "q2"),
            ("l_extendedprice", 0.75, "q3")),
          // generator-law envelope (q35's note): literal bucket bounds,
          // no sketch job; a violated envelope only unbalances buckets
          envelope = Map("l_extendedprice" -> (900.0, 105000.0)))
          .head()
        val (q1, q2, q3) = (b.getDouble(1), b.getDouble(2), b.getDouble(3))
        li.select(
            when($"l_extendedprice" < q1, 0L)
              .when($"l_extendedprice" < q2, 1L)
              .when($"l_extendedprice" < q3, 2L)
              .otherwise(3L).as("bucket"), $"pc")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), sum($"pc").as("cents"))
          .orderBy($"bucket")
      },
      Some("""
        WITH b AS (
          SELECT QUANTILE_CONT(l_extendedprice, 0.25) AS q1,
                 QUANTILE_CONT(l_extendedprice, 0.50) AS q2,
                 QUANTILE_CONT(l_extendedprice, 0.75) AS q3
          FROM lineitem)
        SELECT CAST(CASE WHEN l_extendedprice < (SELECT q1 FROM b) THEN 0
                         WHEN l_extendedprice < (SELECT q2 FROM b) THEN 1
                         WHEN l_extendedprice < (SELECT q3 FROM b) THEN 2
                         ELSE 3 END AS BIGINT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        GROUP BY 1
        ORDER BY bucket"""),
      doc = "Equi-height histogram: bucket bounds from the distributed exact-percentile operator (bit-equal to QUANTILE_CONT), one bucketing scan against 3 literal bounds — optimizer-statistics construction as a first-class, oracle-checked operator."),

    Q(
      "q89_bag_set_ops",
      (s, d) => {
        import s.implicits._
        // Multiset (bag) set operations — the ALL variants q10's
        // set-semantics row doesn't touch. Catalyst plans these as
        // count-aggregate + multiplicity replication (no row-by-row
        // matching): one shuffle per side keyed on the value, min/diff of
        // the counts, generate to re-expand — the only shape that holds
        // at 100 TB, where "pair up duplicate rows" is not a plan.
        val c = Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
        val sup = Tables.supplier(s, d).select($"s_nationkey".as("nationkey"))
        c.intersectAll(sup).withColumn("op", lit("intersect_all"))
          .unionByName(c.exceptAll(sup).withColumn("op", lit("except_all")))
          .orderBy($"op", $"nationkey")
      },
      Some("""
        SELECT nationkey, 'intersect_all' AS op FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT ALL
          SELECT s_nationkey AS nationkey FROM supplier) i
        UNION ALL
        SELECT nationkey, 'except_all' AS op FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS nationkey FROM supplier) e
        ORDER BY op, nationkey"""),
      doc = "Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): multiplicity-exact via count-aggregate + replication, never row pairing — completes the set-op family next to q10's DISTINCT variants."),

    Q(
      "q96_bfs_levels",
      (s, d) => {
        import s.implicits._
        // Single-source BFS over the part co-occurrence graph (the same
        // memoized edge table as q83/q86): minimum hop distance within 4
        // hops of the smallest node id. The operator's frontier loop does
        // one join + one anti-join per level (each node expanded exactly
        // once → O(|E|) total work); the oracle re-derives the same
        // levels with a capped recursive CTE + MIN(lvl). Node ids and
        // small integer levels flow unchanged — nothing to drift.
        bfsLevels(s, d).orderBy($"node")
      },
      Some("""
        WITH RECURSIVE el AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0),
        ed AS (SELECT u, v FROM el UNION ALL SELECT v, u FROM el),
        bfs(node, lvl) AS (
          SELECT (SELECT MIN(u) FROM ed), 0
          UNION
          SELECT ed.v, bfs.lvl + 1 FROM bfs JOIN ed ON ed.u = bfs.node
          WHERE bfs.lvl < 4)
        SELECT node, CAST(MIN(lvl) AS INT) AS lvl
        FROM bfs GROUP BY node ORDER BY node"""),
      doc = "Single-source BFS (min hop distance, depth 4) as an iterative frontier expansion — one equi-join + one anti-join per level, O(|E|) total work, lineage cut per round; oracle is a capped WITH RECURSIVE closure."),

    Q(
      "q132_weighted_sssp",
      (s, d) => {
        import s.implicits._
        // Weighted single-source shortest paths (Bellman-Ford as ONE
        // join + grouped MIN per round) over the same co-occurrence
        // graph as q83/q86/q96, with deterministic id-derived integer
        // weights and a cost budget of 16. The budget is what makes the
        // oracle finite: DuckDB's UNION-dedup'd (node, dist) state
        // space is bounded by |V| × 17 because every longer path is
        // pruned — the weighted generalization of q96's capped closure.
        // Exact long arithmetic end to end; nothing to drift.
        ssspDistances(s, d).orderBy($"node")
      },
      Some("""
        WITH RECURSIVE el AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          WHERE a.l_partkey % 4 = 0 AND b.l_partkey % 4 = 0),
        ed AS (SELECT u, v, (u + v) % 9 + 1 AS w FROM el
               UNION ALL SELECT v, u, (u + v) % 9 + 1 FROM el),
        sp(node, dist) AS (
          SELECT (SELECT MIN(u) FROM ed), CAST(0 AS BIGINT)
          UNION
          SELECT ed.v, sp.dist + ed.w FROM sp JOIN ed ON ed.u = sp.node
          WHERE sp.dist + ed.w <= 16)
        SELECT node, MIN(dist) AS dist
        FROM sp GROUP BY node ORDER BY node"""),
      doc = "Weighted single-source shortest paths (Bellman-Ford, cost budget 16): one equi-join + grouped MIN per round, rounds bounded by the budget, only the (node, dist) vector on the wire; per-round lineage cut + eager release; oracle is the budget-pruned WITH RECURSIVE state closure."),

    Q(
      "q142_kcore",
      (s, d) => {
        import s.implicits._
        // k-CORE (k=20) of the co-occurrence graph — the dense-community
        // member of the graph family (operators/KCore): parallel peeling
        // rounds of one map-side-combined degree count + two broadcast
        // anti-joins, per-round lineage cut + eager release. The oracle
        // unrolls the SAME parallel peel as 16 materialized CTE levels
        // (margin over the measured convergence round) and re-derives
        // every member's in-core degree.
        kcoreMembers(s, d)
          .select($"node", $"deg")
          .orderBy($"node")
      },
      Some(kcoreOracleSql(k = 20, rounds = 16)),
      doc = "k-core extraction (k=20) by parallel peeling: delete all degree-<k nodes per round until fixpoint — the maximal subgraph with all degrees >= k, the dense-community/spam-ring primitive; per-round cost is one map-side-combined degree count + two broadcast anti-joins, lineage cut per round; oracle unrolls the identical peel as 16 MATERIALIZED CTE levels (DuckDB would otherwise inline each twice-referenced level into an exponential plan) and re-derives in-core degrees."),

    Q(
      "q97_dq_audit",
      (s, d) => {
        import s.implicits._
        // Data-quality audit suite (the Deequ/expectation-suite operator
        // class): completeness, uniqueness, distinctness, pattern
        // conformance, range and mean metrics — ALL computed in ONE
        // aggregate pass over the table (map-side partial agg, no second
        // scan), then melted to (metric, value) rows. Ratios divide
        // exact integers as doubles and the mean divides the exact
        // decimal sum — both IEEE-identical across engines.
        val m = Tables.customer(s, d).agg(
          count(lit(1)).as("n"),
          countDistinct($"c_custkey").as("dk"),
          countDistinct($"c_mktsegment").as("dm"),
          sum(when($"c_name".isNotNull, 1L).otherwise(0L)).as("nn"),
          sum(when($"c_name".rlike("^Customer#[0-9]{8}0$"), 1L).otherwise(0L)).as("pat"),
          sum(when($"c_acctbal" < 0, 1L).otherwise(0L)).as("neg"),
          min($"c_acctbal").as("mn"),
          max($"c_acctbal").as("mx"),
          sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("sm"))
        m.select(explode(map(
            lit("row_count"), $"n".cast("double"),
            lit("uniqueness_c_custkey"), $"dk".cast("double") / $"n".cast("double"),
            lit("distinct_c_mktsegment"), $"dm".cast("double"),
            lit("completeness_c_name"), $"nn".cast("double") / $"n".cast("double"),
            lit("pattern_rate_c_name"), $"pat".cast("double") / $"n".cast("double"),
            lit("negative_rate_c_acctbal"), $"neg".cast("double") / $"n".cast("double"),
            lit("min_c_acctbal"), $"mn",
            lit("max_c_acctbal"), $"mx",
            lit("mean_c_acctbal"), $"sm" / $"n".cast("double")))
            .as(Seq("metric", "value")))
          .orderBy($"metric")
      },
      Some("""
        WITH a AS (
          SELECT COUNT(*) AS n,
                 COUNT(DISTINCT c_custkey) AS dk,
                 COUNT(DISTINCT c_mktsegment) AS dm,
                 SUM(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS nn,
                 SUM(CASE WHEN regexp_full_match(c_name, 'Customer#[0-9]{8}0') THEN 1 ELSE 0 END) AS pat,
                 SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS neg,
                 MIN(c_acctbal) AS mn,
                 MAX(c_acctbal) AS mx,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sm
          FROM customer)
        SELECT metric, value FROM (
          SELECT 'row_count' AS metric, CAST(n AS DOUBLE) AS value FROM a
          UNION ALL SELECT 'uniqueness_c_custkey', CAST(dk AS DOUBLE) / CAST(n AS DOUBLE) FROM a
          UNION ALL SELECT 'distinct_c_mktsegment', CAST(dm AS DOUBLE) FROM a
          UNION ALL SELECT 'completeness_c_name', CAST(nn AS DOUBLE) / CAST(n AS DOUBLE) FROM a
          UNION ALL SELECT 'pattern_rate_c_name', CAST(pat AS DOUBLE) / CAST(n AS DOUBLE) FROM a
          UNION ALL SELECT 'negative_rate_c_acctbal', CAST(neg AS DOUBLE) / CAST(n AS DOUBLE) FROM a
          UNION ALL SELECT 'min_c_acctbal', mn FROM a
          UNION ALL SELECT 'max_c_acctbal', mx FROM a
          UNION ALL SELECT 'mean_c_acctbal', sm / CAST(n AS DOUBLE) FROM a) m
        ORDER BY metric"""),
      doc = "Data-quality audit suite (completeness / uniqueness / distinctness / pattern conformance / range / mean) — nine metrics in ONE aggregate pass, melted to (metric, value) rows; exact-integer ratios and decimal-exact mean finish as identical IEEE divisions."),

    Q(
      "q98_countmin_sketch",
      (s, d) => {
        import s.implicits._
        // Count-Min sketch (depth 4 × width 256) over the event stream's
        // user ids — the classic CMS workload (per-key frequency in a
        // stream whose key space outgrows memory). Building it is one
        // map-side-combinable groupBy onto ≤1024 cells, so the shuffle is
        // bounded no matter how many rows or distinct keys exist. Hashes
        // are md5-derived (CountMin.cell), a pure function of the key, so
        // every counter is an order-independent integer sum and the
        // DuckDB oracle reproduces the WHOLE sketch and every estimate
        // exactly — an approximate operator under an exact cross-engine
        // gate. The width is sized so collisions are REAL at test scale
        // (nonzero overcount rows prove the approximation path is
        // exercised, not vacuously exact); probes are the top-20
        // true-count keys (deterministic tie-break); overcount =
        // est − truth ≥ 0 by the CMS one-sided guarantee.
        val k = Tables.events(s, d).select($"user_id".cast("string").as("key"))
        val sk = graft.operators.CountMin.sketch(k, "key", 4, 256)
        val truth = k.groupBy($"key").agg(count(lit(1)).as("true_cnt"))
        val probes = truth.orderBy($"true_cnt".desc, $"key").limit(20)
        graft.operators.CountMin
          .estimate(sk, probes.select($"key"), "key", 4, 256)
          .join(probes, "key")
          .select($"key", $"true_cnt", $"cms_est",
            ($"cms_est" - $"true_cnt").as("overcount"))
          .orderBy($"key")
      },
      Some("""
        WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
        ds AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
        sk AS (
          SELECT d, CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(d AS VARCHAR), '|', key)), 1, 8)) AS BIGINT) % 256 AS cell,
                 COUNT(*) AS cnt
          FROM k CROSS JOIN ds
          GROUP BY 1, 2),
        truth AS (SELECT key, COUNT(*) AS true_cnt FROM k GROUP BY key),
        probes AS (SELECT key, true_cnt FROM truth ORDER BY true_cnt DESC, key LIMIT 20),
        est AS (
          SELECT p.key, MIN(s.cnt) AS cms_est
          FROM probes p CROSS JOIN ds
          JOIN sk s ON s.d = ds.d
            AND s.cell = CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(ds.d AS VARCHAR), '|', p.key)), 1, 8)) AS BIGINT) % 256
          GROUP BY p.key)
        SELECT p.key, p.true_cnt, e.cms_est, e.cms_est - p.true_cnt AS overcount
        FROM probes p JOIN est e ON e.key = p.key
        ORDER BY p.key"""),
      doc = "Count-Min sketch (4x256, md5-derived hashes) over event-stream user ids: constant-memory frequency summary built with one bounded groupBy; cell-wise mergeable; the DuckDB oracle replays the ENTIRE sketch and every point estimate exactly, including real collisions."),

    Q(
      "q101_space_saving",
      (s, d) => {
        import s.implicits._
        // Mergeable Space-Saving summary (capacity 8 per partition) over
        // the token stream — the operator q84's exact heavy hitters
        // defers to when the key space is unbounded: O(k) state per
        // partition, merged relationally into per-key [lb, ub] count
        // bounds plus the global containment floor (no key above it can
        // be missed). Bounds are data-dependent on the partition layout,
        // so this row is rows-only; AnalyticsSpec pins the guarantees
        // (sandwich on every key, containment on a skewed stream,
        // degeneration to exact counts when capacity covers the space).
        val tok = Tables.documents(s, d)
          .select(explode(split(lower($"text"), "[^a-z]+")).as("token"))
          .filter($"token" =!= "")
        graft.operators.SpaceSaving.summarize(tok, "token", 8)
          .orderBy($"ub".desc, $"lb".desc, $"key")
          .limit(10)
      },
      None,
      doc = "Space-Saving mergeable top-k summary (ICDT'05 / PODS'12): capacity-8 per-partition counter sets merged into per-key [lb, ub] bounds with a containment floor — the constant-state heavy-hitter path for unbounded key spaces; guarantees pinned in AnalyticsSpec."),

    Q(
      "q109_quantile_summary",
      (s, d) => {
        import s.implicits._
        // Deterministic mergeable quantile summary (m=64 samples per
        // partition, exact local ranks) over document lengths —
        // completing the sketch family: frequency (q98 CMS, q101
        // SpaceSaving), distinct (q75 HLL, q81 bitmap), membership
        // (q87 bloom), quantiles (this). Rank-error bound is
        // Σ_p ceil(n_p/64); estimates depend on the partition layout,
        // so this row is rows-only and AnalyticsSpec pins the bound,
        // the lower-bound property, and exactness at full capacity
        // against the q107 PERCENTILE_DISC convention.
        val lens = Tables.documents(s, d)
          .select(length($"text").cast("long").as("len"))
        val summary = graft.operators.QuantileSummary.summarize(lens, "len", 64)
        graft.operators.QuantileSummary.quantiles(summary, Seq(500, 900, 990))
      },
      None,
      doc = "Deterministic mergeable quantile summary: m equi-spaced per-partition samples with exact local ranks, merged relationally into rank estimates with a provable sum-of-ceil(n_p/m) error bound — the constant-state quantile path (PODS'12 mergeable-summaries framing); guarantees pinned in AnalyticsSpec."),

    Q(
      "q124_kll_quantiles",
      (s, d) => {
        import s.implicits._
        // KLL-style UPDATABLE quantile sketch (deterministic alternating
        // compaction) over document lengths — the streaming quantile
        // path q109's sort-based summary cannot provide: per-row update,
        // level-wise merge, and a CERTIFIED worst-case rank bound the
        // sketch carries in itself (err_bound column). Estimates depend
        // on the partition layout, so this row is rows-only; KllSpec
        // pins |est − true| ≤ errBound on every probe, weight
        // conservation, merge-bound additivity, below-capacity
        // exactness, and bit-identical reruns.
        val lens = Tables.documents(s, d)
          .select(length($"text").cast("long").as("len"))
        graft.operators.Kll.quantiles(lens, "len", Seq(500, 900, 990), k = 64)
      },
      None,
      doc = "KLL-style updatable quantile sketch (KLL'16 structure, deterministic alternating-parity compaction): constant-state per-partition streaming build, pid-ordered merge, self-certified worst-case rank bound emitted alongside each estimate; guarantees pinned in KllSpec."),

    Q(
      "q126_kll_grouped",
      (s, d) => {
        import s.implicits._
        // GROUPED KLL quantiles as one TypedImperativeAggregate: the
        // shuffle carries constant-size sketches (not rows), partial
        // aggregation combines map-side — at 100 TB a per-group
        // quantile profile costs one pass and never co-locates a group
        // (q35/q107 are the exact paths; this is the sketch path).
        // Aggregation merge order is partitioning-dependent and KLL
        // merge is not order-invariant, so the row is rows-only; the
        // invariant that holds under EVERY merge order — true rank of
        // each estimate within the EMITTED err_bound — is pinned in
        // KllSpec (batch groups + streaming complete mode).
        Tables.documents(s, d)
          .groupBy($"lang")
          .agg(graft.functions.KllAgg(
            length($"text").cast("long"), 64, Seq(500, 900)).as("qs"))
          .select($"lang", $"qs.n".as("n"), $"qs.err_bound".as("err_bound"),
            $"qs.q_500".as("q_500"), $"qs.q_900".as("q_900"))
          .orderBy($"lang")
      },
      None,
      doc = "Grouped KLL quantiles in ONE aggregate pass: per-group sketches with map-side partial aggregation (the shuffle carries sketches, not rows), each emitting its self-certified worst-case rank bound — the constant-state grouped-quantile path next to the exact q35/q107; bound invariance under any merge order pinned in KllSpec."),

    Q(
      "q131_kll_rollup",
      (s, d) => {
        import s.implicits._
        // SKETCH STORE + ROLLUP: stage 1 materializes one BINARY KLL
        // sketch per language (the stored-partial-aggregate a warehouse
        // persists next to its group keys); stage 2 answers the GLOBAL
        // quantile by merging only those bytes — the raw rows are never
        // touched again. This is the sketch analog of q85's
        // monoid-merge incremental aggregates, for a statistic no
        // scalar monoid carries; the merged err_bound certifies every
        // estimate over the union regardless of how the store was
        // grouped. Rows-only; KllSpec pins the parquet round-trip and
        // the rollup-equals-direct-aggregation property.
        val perLang = Tables.documents(s, d)
          .groupBy($"lang")
          .agg(graft.functions.KllSketchBytesAgg(
            length($"text").cast("long"), 64).as("sk"))
        perLang
          .agg(graft.functions.KllMergeAgg($"sk", 64, Seq(500, 900)).as("qs"))
          .select($"qs.n".as("n"), $"qs.err_bound".as("err_bound"),
            $"qs.q_500".as("q_500"), $"qs.q_900".as("q_900"))
      },
      None,
      doc = "KLL sketch store + rollup: per-group BINARY sketches materialized once, global quantiles answered later by merging only the stored bytes (raw data never re-read) — the stored-partial-aggregate pattern for quantiles, with the merged self-certified bound covering the union; round-trip and rollup-equality pinned in KllSpec."),

    Q(
      "q115_bitmap_overlap",
      (s, d) => {
        import s.implicits._
        // Segment-overlap matrix via bitmap set algebra: one scan builds
        // a membership bitmap per event_type (map-side dedup into bits,
        // OR-merge — q81's aggregate emitting the BITMAP instead of its
        // count), then every pairwise |A ∩ B| is an AND+popcount over
        // ~1 bit/user bitmaps. The user level is never joined or
        // re-shuffled — the relational alternative self-joins the
        // distinct (type, user) pairs on user_id, a second full shuffle
        // that grows with membership, which is exactly what the DuckDB
        // oracle does to verify this exactly. The pair join is a
        // bounded 5x5 cross of segment rows, not data.
        val seg = Tables.events(s, d)
          .groupBy($"event_type")
          .agg(graft.functions.BitmapBits($"user_id").as("bits"))
        val a = seg.select($"event_type".as("et_a"), $"bits".as("ba"))
        val b = seg.select($"event_type".as("et_b"), $"bits".as("bb"))
        a.join(b, $"et_a" < $"et_b")
          .select($"et_a", $"et_b",
            graft.functions.BitmapCardinality($"ba").as("n_a"),
            graft.functions.BitmapCardinality($"bb").as("n_b"),
            graft.functions.BitmapAndCount($"ba", $"bb").as("overlap"))
          .orderBy($"et_a", $"et_b")
      },
      Some("""
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        cnt AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type),
        ov AS (
          SELECT x.event_type AS et_a, y.event_type AS et_b, COUNT(*) AS c
          FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
          GROUP BY x.event_type, y.event_type)
        SELECT p.et_a, p.et_b, ca.n AS n_a, cb.n AS n_b,
               CAST(COALESCE(ov.c, 0) AS BIGINT) AS overlap
        FROM (SELECT a.event_type AS et_a, b.event_type AS et_b
              FROM cnt a JOIN cnt b ON a.event_type < b.event_type) p
        JOIN cnt ca ON ca.event_type = p.et_a
        JOIN cnt cb ON cb.event_type = p.et_b
        LEFT JOIN ov ON ov.et_a = p.et_a AND ov.et_b = p.et_b
        ORDER BY p.et_a, p.et_b"""),
      doc = "Audience-overlap matrix via bitmap set algebra: per-segment membership bitmaps (one scan, ~1 bit/user on the exchange), pairwise AND+popcount — the user level is never self-joined; the oracle verifies exactly via the distinct-pair self-join this operator avoids.")
  )
}
