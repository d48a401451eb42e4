package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SubstrDedup, TokenDecontam}

/** Pins the token-level decontamination tier (q213):
  *   - the PLANTED CASE the char tier provably misses: a 14-char
  *     out-of-vocabulary phrase carrying 14 BPE tokens — char-level
  *     contaminationSpans (L=40) sees nothing, the 13-token tier flags
  *     both carriers;
  *   - the threshold is sharp IN TOKEN UNITS: a 13-token shared run
  *     flags, a 12-token one does not;
  *   - the tiers agree where they overlap (a 62-char / 17-token
  *     sentence flags in both);
  *   - spans come back in BPE-token coordinates (verified against the
  *     encoder's own token stream);
  *   - n is a real parameter (raising it past the longest plant
  *     empties the answer).
  */
class TokenDecontamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private def fx = spark.read.parquet(
    graft.queries.DedupQueries.TokenFixture.ensure(spark))
  private def train = fx.filter(col("doc_id") < 900L)
  private def bench = fx.filter(col("doc_id") >= 900L)

  test("token-dense leak invisible to the char tier, flagged by the token tier; threshold sharp; tiers agree on the long plant") {
    // char tier: ONLY the 62-char sentence host crosses L=40 — the
    // dense plants are 14-16 shared chars
    val charDocs = SubstrDedup.contaminationSpans(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(charDocs == Set(13L),
      s"char tier must see only the long-sentence host: $charDocs")
    val spans = TokenDecontam.contaminationTokenSpans(train, bench)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byDoc = spans.groupBy(_._1)
    // token tier: the two dense carriers, the long-sentence host, and
    // the exactly-13 edge — NOT the 12-token prefix, the clean doc, or
    // the intra-train repeat
    assert(byDoc.keySet == Set(10L, 11L, 13L, 16L),
      s"token tier docs: ${byDoc.keySet}")
    assert(spans.forall(_._2 == 1L), "one maximal span per carrier")
    val lens = byDoc.view.mapValues(_.head._5).toMap
    // 15 = boundary </w> (both flanking words end in a bare </w> token,
    // itself shared context) + Dense14's 14 tokens
    assert(lens(10L) == 15L && lens(11L) == 15L, s"dense spans: $lens")
    // the sharp edge: exactly the 13-token run, no boundary gain (the
    // "the" flank ends in the MERGED the</w> token)
    assert(lens(16L) == 13L, s"edge span: ${lens(16L)}")
    // the both-tiers sentence: Long17's 17 tokens, no boundary gain
    assert(lens(13L) == 17L, s"sentence span: ${lens(13L)}")
  }

  test("spans are in BPE-token coordinates: the edge span covers exactly the planted token run") {
    import spark.implicits._
    // re-derive doc 16's token stream through the same encoder and
    // locate the planted run ["z","q","</w>",...] — the reported span
    // must cover it exactly
    val ts = train.filter($"doc_id" === 16L)
      .select(split(graft.operators.Bpe.encode($"text"), " ").as("ts"))
      .head().getSeq[String](0)
    val zAt = ts.indexOf("z") + 1 // 1-based
    assert(zAt > 1, s"plant not found in token stream: $ts")
    val span = TokenDecontam.contaminationTokenSpans(train, bench)
      .filter(col("doc_id") === 16L)
      .select("span_start", "span_end").head()
    assert(span.getLong(0) == zAt.toLong && span.getLong(1) == zAt + 12L,
      s"span [${span.getLong(0)}, ${span.getLong(1)}] vs planted run at $zAt in $ts")
  }

  test("incremental leg: the persisted token-window index reconstructs the from-scratch answer; waves union; mismatched state fails loudly") {
    import spark.implicits._
    // the frozen-train-index deployment: tokenize + window the corpus
    // ONCE, persist, probe every future benchmark against the lake copy
    val dir = java.nio.file.Files.createTempDirectory("tok_idx").toString
    TokenDecontam.tokenWindowIndex(train).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val against = TokenDecontam.contaminationTokenSpansAgainst(bench, idx)
      .collect().map(_.toSeq).toSet
    val scratch = TokenDecontam.contaminationTokenSpans(train, bench)
      .collect().map(_.toSeq).toSet
    assert(against == scratch && against.nonEmpty)
    // two benchmark waves with OVERLAPPING 13-token fragments of the
    // 17-token sentence: per-wave probes merge through mergeSpans into
    // the from-scratch answer over the union (growth actually happens —
    // each wave alone yields a 13-token span for doc 13)
    val w1 = Seq(9100L ->
      "aaa the data batch scan join stream merge sort fast key row zzz")
      .toDF("doc_id", "text")
    val w2 = Seq(9101L ->
      "qqq batch scan join stream merge sort fast key row window www")
      .toDF("doc_id", "text")
    val s1 = TokenDecontam.contaminationTokenSpansAgainst(w1, idx)
    val s2 = TokenDecontam.contaminationTokenSpansAgainst(w2, idx)
    assert(s1.collect().forall(_.getAs[Long]("span_len") == 13L))
    val merged = graft.operators.SubstrDedup.mergeSpans(s1.unionByName(s2))
      .collect().map(_.toSeq).toSet
    val full = TokenDecontam.contaminationTokenSpans(train, w1.unionByName(w2))
      .collect().map(_.toSeq).toSet
    assert(merged == full)
    assert(full.exists(r => r.head == 13L && r(4) == 17L),
      s"the union must cover the full 17-token sentence: $full")
    // loud state guards: an index built at another n joins to nothing
    // and must refuse instead; a frame without the n record is not an
    // index at all
    val e1 = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(bench, idx, n = 12)
    }
    assert(e1.getMessage.contains("n=13") && e1.getMessage.contains("n=12"))
    val e2 = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(bench, idx.drop("n"))
    }
    assert(e2.getMessage.contains("records no"))
    // TOKENIZER compatibility axis (live since Bpe.saveMerges made
    // running a reloaded learned table legitimate): a probe tokenizing
    // with a different merges table hashes disjoint window keys and
    // must refuse by fingerprint, a pre-record index must refuse by
    // name, and a MATCHED non-default tokenizer reconstructs the
    // from-scratch answer under that tokenizer end-to-end
    val other = graft.operators.Bpe.StandardMerges.take(10)
    val e3 = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(bench, idx, merges = other)
    }
    assert(e3.getMessage.contains("tokenizer 0x"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(bench, idx.drop("tok"))
    }
    assert(e4.getMessage.contains("tok"), e4.getMessage)
    val idx2 = TokenDecontam.tokenWindowIndex(train, merges = other)
    val against2 = TokenDecontam.contaminationTokenSpansAgainst(bench, idx2, merges = other)
      .collect().map(_.toSeq).toSet
    val scratch2 = TokenDecontam.contaminationTokenSpans(train, bench, merges = other)
      .collect().map(_.toSeq).toSet
    assert(against2 == scratch2,
      "matched non-default tokenizer must reconstruct the from-scratch answer")
    assert(scratch2 != scratch,
      "the truncated merges table must actually change token coordinates " +
        "(otherwise the skew guard tests nothing)")
  }

  test("n is a real parameter: raising it past the longest plant empties the answer; lowering it admits the 12-token prefix") {
    // longest shared run is Long17's 17 tokens: n=18 finds nothing
    assert(TokenDecontam.contaminationTokenSpans(train, bench, n = 18)
      .count() == 0L)
    // n=12 admits the 12-token host too
    val at12 = TokenDecontam.contaminationTokenSpans(train, bench, n = 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(at12.contains(12L), s"n=12 must flag the prefix host: $at12")
    assert(intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpans(train, bench, n = 1)
    }.getMessage.contains("not a contamination test"))
  }
}
