package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q173's fixed-point integer log2 idf and the BM25 ranking built on it.
  *
  * The idf kernel is milli_log2(x) = (bitlen(x)-1)*1000
  *   + ((x*1000) >> (bitlen(x)-1)) - 1000 — floor(log2) from the bit
  * length plus a linear-interpolation fraction from one shift. Linear
  * interpolation of log2 between powers of two always UNDERestimates
  * (log2 is concave, the interp is its chord) and the gap is maximal at
  * t = 1/ln2, where it is log2(1/ln2) - (1/ln2 - 1) = 0.08607 bits.
  * Floors add at most ~1 milli-bit more. That bound is what makes the
  * "documented divergence from ln idf" claim quantitative.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private val milliLog2Sql =
    "(length(bin(x)) - 1) * 1000 + shiftright(x * 1000L, length(bin(x)) - 1) - 1000"

  test("fixed-point milli_log2: certified error band [0, 87.2] milli-bits, and monotone") {
    import spark.implicits._
    // every bit length up to 2^40 plus the mid-band worst-case region
    val xs = (1 to 40).flatMap { b =>
      val base = 1L << b
      Seq(base, base + base / 3, (base * 1.4427).toLong.max(base), base * 2 - 1)
    }.distinct.sorted
    val got = xs.toDF("x")
      .select($"x", expr(milliLog2Sql).as("m"))
      .as[(Long, Long)].collect().sortBy(_._1)
    got.foreach { case (x, m) =>
      val err = math.log(x.toDouble) / math.log(2.0) - m.toDouble / 1000.0
      assert(err >= 0.0 && err <= 0.0872, s"x=$x m=$m err=$err")
    }
    // nondecreasing in x: ranking by the fixed-point idf never inverts
    // a ranking by the true log2
    assert(got.sliding(2).forall {
      case Array((_, a), (_, b)) => a <= b
      case _ => true
    })
  }

  test("q173 result: scores strictly ranked, term counts sane, repeat-run identical") {
    val dir = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("q173_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run()
    assert(a.nonEmpty && a.length <= 20)
    // ordered by (score desc, doc_id): deterministic top-k
    assert(a.sliding(2).forall {
      case Array((d1, s1, _), (d2, s2, _)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    assert(a.forall { case (_, s, nt) => s > 0 && nt >= 1 && nt <= 3 })
    assert(a.sameElements(run()))
  }

  test("milli_log2 SQL function: exact at powers of two, bit-equal to the inline kernel") {
    import spark.implicits._
    // suites share one JVM session; register explicitly like SqlSurfaceSpec
    graft.functions.GraftFunctions.register(spark)
    // anchors: milli_log2(2^k) == k*1000 exactly (frac term is zero)
    (0 to 40 by 8).foreach { k =>
      val got = spark.sql(s"SELECT milli_log2(${1L << k}) AS m").head().getLong(0)
      assert(got == k * 1000L, s"2^$k -> $got")
    }
    val xs = (1 to 2000).map(_.toLong * 7919)
    val viaFn = xs.toDF("x").selectExpr("milli_log2(x) AS m").as[Long].collect().toSeq
    val viaExpr = xs.toDF("x").select(expr(milliLog2Sql).as("m")).as[Long].collect().toSeq
    assert(viaFn == viaExpr)
  }

  test("append property: random batch splits always rebuild the same index and retrieval") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val full = Bm25.build(docs)
    val fullTop = Bm25.topk(full, Seq("dup", "spark", "window"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val m = rnd.nextInt(5) + 3 // split modulus in 3..7 → 3 disjoint batches
      val parts = Seq(
        docs.filter(col("doc_id") % m === 0),
        docs.filter(col("doc_id") % m === 1),
        docs.filter(col("doc_id") % m >= 2))
      val chained = parts.tail.foldLeft(Bm25.build(parts.head))(Bm25.append(_, _))
      assert(chained.nDocs == full.nDocs && chained.totalTokens == full.totalTokens,
        s"modulus $m: scalars diverged")
      val got = Bm25.topk(chained, Seq("dup", "spark", "window"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == fullTop, s"modulus $m: retrieval diverged")
    }
  }

  test("incremental index append == from-scratch rebuild (postings, scalars, AND retrieval)") {
    import graft.operators.Bm25
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val oldDocs = docs.filter(col("doc_id") % 3 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 3 === 0)
    val full = Bm25.build(docs)
    val incr = Bm25.append(Bm25.build(oldDocs), newDocs)
    assert(incr.nDocs == full.nDocs && incr.totalTokens == full.totalTokens)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(incr.tfLen) == rows(full.tfLen))
    // retrieval sees appended docs with correct idf (df derived at query
    // time, never baked into the index)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(Bm25.topk(incr, Seq("dup", "spark"), 10)) ==
      top(Bm25.topk(full, Seq("dup", "spark"), 10)))
  }

  test("append refuses an overlapping batch loudly (silent df double-count otherwise)") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = Bm25.build(docs.filter(col("doc_id") < 30))
    val e = intercept[IllegalArgumentException] {
      Bm25.append(idx, docs.filter(col("doc_id") < 10))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("append refuses a tokenizer-mode mismatch loudly (silent token-space blend otherwise)") {
    import graft.operators.Bm25
    import spark.implicits._
    val docs = Seq((1L, "spark engine design"), (2L, "数据处理引擎")).toDF("doc_id", "text")
    val more = Seq((3L, "query planning"), (4L, "大规模分析")).toDF("doc_id", "text")
    // both directions: unicode index + ascii append, ascii index +
    // unicode append — either blend would mix two token spaces into one
    // posting table and skew every df/idf with no error
    val uniIdx = Bm25.build(docs, unicode = true)
    val e1 = intercept[IllegalArgumentException] { Bm25.append(uniIdx, more) }
    assert(e1.getMessage.contains("tokenizer mode mismatch"))
    val asciiIdx = Bm25.build(docs)
    val e2 = intercept[IllegalArgumentException] {
      Bm25.append(asciiIdx, more, unicode = true)
    }
    assert(e2.getMessage.contains("tokenizer mode mismatch"))
    // matching modes still append fine (the guard is not over-broad)
    assert(Bm25.append(uniIdx, more, unicode = true).nDocs == 4)
  }

  test("index artifact leg: loaded == built retrieval bit-for-bit; mode survives the round trip; skew fails loudly") {
    import graft.operators.Bm25
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val idx = Bm25.build(docs)
    val dir = java.nio.file.Files.createTempDirectory("bm25_art").toString
    Bm25.saveIndex(idx, dir)
    val loaded = Bm25.loadIndex(spark, dir)
    // scalars integer-exact; retrieval bit-for-bit
    assert(loaded.nDocs == idx.nDocs && loaded.totalTokens == idx.totalTokens
      && loaded.unicode == idx.unicode)
    val terms = Seq("data", "the", "with")
    def rows(i: Bm25.Index) =
      Bm25.topk(i, terms, 10).collect().map(_.toSeq).toSet
    assert(rows(loaded) == rows(idx) && rows(loaded).nonEmpty)
    // append composes with the LOADED index: probe a fresh batch through
    // the lake copy, never re-tokenizing the corpus lineage
    val extra = Seq((900001L, "brand new data document with tokens"))
      .toDF("doc_id", "text")
    assert(rows(Bm25.append(loaded, extra)) == rows(Bm25.append(idx, extra)))
    // the tokenizer-mode record survives the round trip AND keeps
    // enforcing: a unicode index reloaded still refuses an ascii append
    val uniDir = java.nio.file.Files.createTempDirectory("bm25_uni").toString
    Bm25.saveIndex(Bm25.build(
      Seq((1L, "数据处理引擎"), (2L, "spark engine")).toDF("doc_id", "text"),
      unicode = true), uniDir)
    val uniLoaded = Bm25.loadIndex(spark, uniDir)
    assert(uniLoaded.unicode)
    assert(intercept[IllegalArgumentException] {
      Bm25.append(uniLoaded, extra)
    }.getMessage.contains("tokenizer mode mismatch"))
    // loud skew: version bump refused by name; a scalar-stripped
    // manifest is not an index; missing _SUCCESS blocks the table
    import java.nio.file.{Files, Paths}
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val mPath = Paths.get(dir, "MANIFEST.json")
    val mj = om.readTree(Files.readAllBytes(mPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    mj.put("version", 99)
    Files.write(mPath, om.writeValueAsBytes(mj))
    val verEx = intercept[IllegalArgumentException] { Bm25.loadIndex(spark, dir) }
    assert(verEx.getMessage.contains("version 99"))
    mj.put("version", Bm25.ArtifactVersion); mj.remove("n_docs")
    Files.write(mPath, om.writeValueAsBytes(mj))
    assert(intercept[IllegalArgumentException] { Bm25.loadIndex(spark, dir) }
      .getMessage.contains("control-plane scalars"))
    assert(intercept[IllegalArgumentException] {
      Bm25.loadIndex(spark, java.nio.file.Files
        .createTempDirectory("bm25_empty").toString)
    }.getMessage.contains("MANIFEST"))
    Files.delete(Paths.get(uniDir, "tf_len", "_SUCCESS"))
    assert(intercept[IllegalArgumentException] { Bm25.loadIndex(spark, uniDir) }
      .getMessage.contains("_SUCCESS"))
  }

  test("fixed-point ranking tracks true double-ln BM25: top-20 overlap >= 16/20") {
    import graft.operators.Bm25
    val dir = "/root/testdata/sf0.01"
    val terms = Seq("dup", "spark", "window")
    val idx = Bm25.build(Tables.documents(spark, dir))
    val fixed = Bm25.topk(idx, terms, 20).collect().map(_.getLong(0)).toSet
    // local replay with REAL ln idf and double arithmetic (what a
    // non-conformance-constrained engine would compute)
    val hits = idx.tfLen.filter(col("token").isin(terms: _*))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val dfT = hits.groupBy(_._2).map { case (t, rs) => t -> rs.length }.toMap
    val n = idx.nDocs.toDouble
    val avg = idx.totalTokens.toDouble / n
    val trueScores = hits.groupBy(_._1).map { case (doc, rs) =>
      doc -> rs.map { case (_, t, tf, len) =>
        val idf = math.log((n - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1.0)
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avg))
      }.sum
    }
    val trueTop = trueScores.toSeq.sortBy { case (d, s) => (-s, d) }.take(20).map(_._1).toSet
    val overlap = (fixed & trueTop).size
    assert(overlap >= 16, s"fixed-point top-20 shares only $overlap docs with true-ln BM25")
  }

  test("streaming index maintenance: foreachBatch-appended postings == batch rebuild") {
    import spark.implicits._
    import graft.operators.Bm25
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm25_stream").toString
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // production shape: each arriving micro-batch tokenizes ITS docs only
    // and APPENDS posting rows — corpus postings are never rewritten,
    // and df/idf are derived at query time so no stored weight goes stale
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Bm25.build(batch.toDF()).tfLen
          .write.mode("append").parquet(s"$dir/postings")
        ()
      }
      .start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val postings = spark.read.parquet(s"$dir/postings")
    // scalars recovered from the postings artifact alone (every testdata
    // doc has >= 1 token, so distinct doc_id == corpus size)
    val n = postings.select(col("doc_id")).distinct().count()
    val l = postings.agg(sum(col("tf"))).head().getLong(0)
    val streamed = Bm25.Index(postings, n, l)
    val batchIdx = Bm25.build(Tables.documents(spark, sf))
    assert(n == batchIdx.nDocs && l == batchIdx.totalTokens)
    def top(idx: Bm25.Index) = Bm25.topk(idx, Seq("dup", "spark"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top(streamed) == top(batchIdx))
  }

  test("stop-word-only query: corpus-wide posting list scores near-zero idf, stays ranked") {
    import graft.operators.Bm25
    // the skew case: a query of ONLY hot terms (df ~ N) makes the
    // posting-list filter select most of the index — the aggregation
    // must stay map-side-combinable (one groupBy on doc_id) and the
    // near-zero idf must keep scores small but the ranking total
    val idx = Bm25.build(Tables.documents(spark, "/root/testdata/sf0.001"))
    val rare = Bm25.topk(idx, Seq("dup"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hot = Bm25.topk(idx, Seq("spark", "data"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.nonEmpty && rare.nonEmpty)
    // deterministic total order in both regimes
    assert(hot.sliding(2).forall {
      case Array((d1, s1), (d2, s2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    // idf monotonicity end-to-end: the rare term's top score dominates
    // the stop-word query's top score
    assert(rare.head._2 > hot.head._2,
      s"rare-term top score ${rare.head._2} should exceed hot-term top ${hot.head._2}")
  }

  test("q174 shuffle positions: a permutation of 1..N, invariant under input partitioning") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pos = SparkEntry.queries("q174_corpus_shuffle")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val n = pos.size
    assert(pos.values.toSeq.sorted == (1L to n).toSeq, "positions must be a permutation")
    // the mixer must actually shuffle: identity order would keep >90% of
    // adjacent pairs adjacent; a shuffled order keeps almost none
    val adjacentKept = (0L until n - 1).count(i => pos(i) + 1 == pos(i + 1))
    assert(adjacentKept < n / 10, s"order barely shuffled: $adjacentKept adjacent pairs kept")
  }

  test("milli_log2 SQL surface enforces its domain: out-of-range -> NULL, never garbage") {
    import spark.implicits._
    // x=0 used to return -1000 silently, negatives garbage via bin()'s
    // 64-char two's-complement form, and x > Long.MaxValue/1000
    // overflowed the x*1000 interpolation term
    val hi = Long.MaxValue / 1000
    val rows = spark.sql(
      s"SELECT milli_log2(0L) a, milli_log2(-5L) b, milli_log2(${hi}L + 1) c, " +
        s"milli_log2(${hi}L) d, milli_log2(1L) e").head()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(!rows.isNullAt(3), "upper boundary is IN domain")
    assert(rows.getLong(4) == 0L, "milli_log2(1) == 0")
  }

  test("build's duplicate-id probe catches within-batch id reuse (the within-batch idf corruption)") {
    import graft.operators.Bm25
    import spark.implicits._
    val dup = Seq((1L, "alpha beta"), (2L, "beta gamma"), (1L, "alpha alpha"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25.build(dup, probeDuplicateIds = true)
    }
    assert(e.getMessage.contains("doc_id=1"))
    // append probes its batch unconditionally (a batch is small by definition)
    val idx = Bm25.build(Seq((10L, "delta")).toDF("doc_id", "text"))
    val e2 = intercept[IllegalArgumentException] { Bm25.append(idx, dup) }
    assert(e2.getMessage.contains("duplicat"))
  }

  test("unicode tokenizer tier: non-Latin documents index and retrieve (ASCII mode drops them)") {
    import graft.operators.Bm25
    import spark.implicits._
    val docs = Seq(
      (1L, "数据处理引擎的设计"),            // zh: engine design
      (2L, "大规模数据分析"),                // zh: large-scale data analysis
      (3L, "обработка данных в масштабе"),  // ru
      (4L, "spark engine design"),          // en
      (5L, "データ処理エンジン")             // ja
    ).toDF("doc_id", "text")
    // ASCII mode: the CJK/Cyrillic docs contribute NOTHING to the index
    val ascii = Bm25.build(docs)
    assert(Bm25.tokenize(docs.filter($"doc_id" === 1)).count() == 0)
    assert(ascii.totalTokens == 3, "only the English doc tokenizes in ASCII mode")
    // unicode mode: every doc indexes; a CJK unigram query retrieves,
    // ranked by exact-integer BM25 like any Latin term
    val uni = Bm25.build(docs, unicode = true)
    assert(uni.nDocs == 5 && uni.totalTokens > 20)
    val got = Bm25.topk(uni, Seq("数", "据"), 3).collect()
    assert(got.nonEmpty && got.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L)),
      "both-ideograph docs must rank; docs without the terms must not")
    // Cyrillic run retrieval
    val ru = Bm25.topk(uni, Seq("данных"), 2).collect()
    assert(ru.map(_.getLong(0)).toSeq == Seq(3L))
    // incremental append preserves the unicode tokenization
    val idx0 = Bm25.build(docs.filter($"doc_id" <= 3), unicode = true)
    val idx1 = Bm25.append(idx0, docs.filter($"doc_id" > 3), unicode = true)
    assert(idx1.nDocs == uni.nDocs && idx1.totalTokens == uni.totalTokens)
  }

  test("probeOverlap=false skips the corpus-side action and still appends correctly") {
    import graft.operators.Bm25
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val full = Bm25.build(docs)
    val incr = Bm25.append(Bm25.build(oldDocs), newDocs, probeOverlap = false)
    assert(incr.nDocs == full.nDocs && incr.totalTokens == full.totalTokens)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top(Bm25.topk(incr, Seq("dup", "spark"), 10)) ==
      top(Bm25.topk(full, Seq("dup", "spark"), 10)))
  }
}
