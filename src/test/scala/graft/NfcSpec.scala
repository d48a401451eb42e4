package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NfcNormalize

/** Pins the Unicode NFC normalization tier (q206/q207):
  *   - hand-computed composition cases on the fixture edges (NFD
  *     accents compose; Hangul jamo compose to syllables; the Angstrom
  *     singleton maps; the composition-exclusion class LENGTHENS; mark
  *     reordering unifies; the ﬁ-ligature stays — the NFKC boundary);
  *   - idempotence over the whole fixture (nfc(nfc(x)) == nfc(x));
  *   - the q207 cluster structure: every logical page's three encoding
  *     variants collapse to ONE group with three raw-distinct members,
  *     min-id survivor;
  *   - SQL surface == Column (same Catalyst expression);
  *   - codegen == interpreted eval.
  */
class NfcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private def fixture = spark.read.parquet(
    graft.queries.TextQueries.NfcFixture.ensure(spark))

  test("hand-computed composition on the fixture edges") {
    import spark.implicits._
    val m = fixture.filter($"doc_id" >= 5000L)
      .select($"doc_id", $"text", NfcNormalize($"text").as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // explicit escapes throughout (the fixture discipline): a literal
    // in test source could itself be re-normalized by tooling
    // empty + pure ASCII: unchanged
    assert(m(5000L)._2 == "")
    assert(m(5001L)._2 == m(5001L)._1)
    // the NFKC boundary: the U+FB01 ligature survives NFC, 5002 != 5003
    assert(m(5002L)._2 == m(5002L)._1 && m(5002L)._2.contains('\uFB01'))
    assert(m(5002L)._2 != m(5003L)._2)
    // decomposed jamo -> one syllable code point (U+AC01)
    assert(m(5004L)._1.contains('\u1100'))
    assert(m(5004L)._2.contains('\uAC01') && !m(5004L)._2.contains('\u1100'))
    // Angstrom singleton U+212B -> U+00C5
    assert(m(5005L)._1.contains('\u212B'))
    assert(m(5005L)._2.contains('\u00C5') && !m(5005L)._2.contains('\u212B'))
    // composition exclusion: U+0958 EXPANDS to U+0915 U+093C
    assert(m(5006L)._1.contains('\u0958'))
    assert(!m(5006L)._2.contains('\u0958') &&
      m(5006L)._2.contains("\u0915\u093C"))
    assert(m(5006L)._2.codePointCount(0, m(5006L)._2.length) ==
      m(5006L)._1.codePointCount(0, m(5006L)._1.length) + 1,
      "exclusion normalization must lengthen by one code point")
    // canonical mark reordering: the two raw texts differ ONLY in the
    // mark order, so their normalized forms must be IDENTICAL
    assert(m(5007L)._1 != m(5008L)._1)
    assert(m(5007L)._2 == m(5008L)._2,
      s"mark orders must unify: ${m(5007L)._2} vs ${m(5008L)._2}")
  }

  test("idempotence over the whole fixture: nfc(nfc(x)) == nfc(x)") {
    import spark.implicits._
    val bad = fixture
      .select(NfcNormalize($"text").as("n1"))
      .select($"n1", NfcNormalize($"n1").as("n2"))
      .filter($"n1" =!= $"n2")
    assert(bad.count() == 0L)
  }

  test("q207 cluster structure: 3 raw variants per logical page, one group each, min-id survivor") {
    import spark.implicits._
    val groups = fixture
      .select($"doc_id",
        md5(NfcNormalize($"text").cast("binary")).as("nm"),
        md5($"text".cast("binary")).as("rm"))
      .groupBy($"nm")
      .agg(min($"doc_id").as("survivor"), count(lit(1)).as("n"),
        countDistinct($"rm").as("nv"))
      .filter($"nv" >= 2)
      .collect()
    // 300 logical pages (3 variants each) + the 5007/5008 mark pair
    assert(groups.length == 301, s"got ${groups.length} multi-variant groups")
    val pages = groups.filter(_.getLong(2) == 3L)
    assert(pages.length == 300)
    assert(pages.forall(r => r.getLong(1) < 300L),
      "every 3-variant survivor must be the base (smallest-id) encoding")
    assert(groups.exists(r => r.getLong(2) == 2L && r.getLong(1) == 5007L))
    // and every variant is RAW-distinct from its base (the clusters are
    // invisible to raw exact dedup)
    assert(groups.forall(r => r.getLong(3) == r.getLong(2)))
  }

  test("composition with the substring tier: NFD-variant spans are invisible raw, detected after normalization") {
    import spark.implicits._
    // the tiers compose: a license paragraph shared between an NFC doc
    // and an NFD doc is byte-distinct at every window, so the
    // exact-substring tier (md5-keyed, like every dedup tier) cannot
    // see it on raw text — normalize FIRST and the span appears. This
    // is the "run NFC before any hash-keyed stage" claim, executed.
    // an accent in EVERY word: an accent-free stretch of >= 40 chars
    // would be byte-identical in both encodings and legitimately
    // detected even on raw text (the first draft of this test proved
    // that the hard way)
    val lic = java.text.Normalizer.normalize(
      (0 until 12).map(i => s"shar\u00E9d$i lic\u00EAnce$i").mkString(" "),
      java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(lic, java.text.Normalizer.Form.NFD)
    assert(nfd != lic)
    val docs = Seq(
      (1L, "unique head one." + lic + ",unique tail one"),
      (2L, "another head two;" + nfd + ":another tail two")
    ).toDF("doc_id", "text")
    val raw = graft.operators.SubstrDedup.dupSpans(docs)
    assert(raw.count() == 0L, "raw bytes differ at every window — no span expected")
    val normalized = docs.select($"doc_id", NfcNormalize($"text").as("text"))
    val spans = graft.operators.SubstrDedup.dupSpans(normalized).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(spans.toSeq.sorted == Seq((1L, lic.length.toLong), (2L, lic.length.toLong)),
      s"normalized spans: ${spans.mkString(", ")}")
  }

  test("normalize flag on the hash-keyed tiers: raw misses every NFD variant, flagged finds them all") {
    import spark.implicits._
    import graft.operators.{ChunkDedup, Dedup, SubstrDedup}
    val fx = fixture
    // 1. shingle tier (q210's primitive): a PURE NFD re-encoding
    //    (doc 1000+i) shares not one raw shingle with its base — every
    //    word starts accented, so every trigram byte-differs — and raw
    //    Jaccard can never see it. (The MIXED variant legitimately
    //    shares its byte-identical NFC tail with the base / its NFD head
    //    with the NFD variant, and one page's short head lets that
    //    half-match cross t=0.5 — a real partial duplicate, not an
    //    encoding artifact, so it is allowed raw.) The flag collapses
    //    each triple to three J=1.0 pairs — 900 page pairs plus the
    //    mark-reorder edge pair.
    val rawPairs = Dedup.jaccardPairs(
        Dedup.shingleSets(fx, "doc_id", "text", 3), 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(rawPairs.forall { case (a, b) => !(a < 300L && b == a + 1000L) },
      s"a pure NFD re-encoding must be invisible to raw shingling: ${rawPairs.take(5).toSeq}")
    assert(rawPairs.length <= 5,
      s"raw detection sees at most stray half-matches: ${rawPairs.length}")
    // 902 = 900 page-variant pairs + the mark-reorder edge pair (both
    // J=1.0) + the ligature pair 5002/5003 at exactly J=0.5 on its
    // eight shared words — NOT unified by the flag (NFC keeps the
    // ligature; the pair crosses the threshold identically raw)
    val flagged = Dedup.jaccardPairs(
      Dedup.shingleSets(fx, "doc_id", "text", 3, normalize = true), 0.5)
    assert(flagged.count() == 902L)
    assert(flagged.filter($"jaccard" =!= 1.0).count() == 1L,
      "collapsed variants are exact matches; only the ligature pair is partial")
    // 2. simhash tier: flagged fingerprints of a page's three variants
    //    are EQUAL (identical normalized token sets); raw fingerprints
    //    come from disjoint token sets and stay far apart
    val rawDistinct = Dedup.simhashFingerprints(fx, "doc_id", "text")
      .filter($"doc" < 3000L)
      .select($"fp").distinct().count()
    assert(rawDistinct == 900L, s"raw: 900 distinct variant fps, got $rawDistinct")
    val flagDistinct = Dedup
      .simhashFingerprints(fx, "doc_id", "text", normalize = true)
      .filter($"doc" < 3000L)
      .select($"fp").distinct().count()
    assert(flagDistinct == 300L, s"flag: one fp per logical page, got $flagDistinct")
    // 3. chunk tier: a base/NFD pair shares ZERO chunks raw (the rolling
    //    hash shifts at the first accent) and EVERY >= 16-char chunk
    //    under the flag (identical normalized text)
    val pagePair = fx.filter($"doc_id".isin(0L, 1000L))
    assert(ChunkDedup.crossDocChunks(
      ChunkDedup.cdcChunks(pagePair, "doc_id", "text")).count() == 0L)
    assert(ChunkDedup.crossDocChunks(
      ChunkDedup.cdcChunks(pagePair, "doc_id", "text", normalize = true))
      .count() > 0L)
    // 4. substring tier: the flag is the internal form of the external
    //    normalize-then-detect composition pinned above — identical span
    //    sets, positions in normalized coordinates
    val viaFlag = SubstrDedup.dupSpans(pagePair, normalize = true)
      .collect().map(_.toSeq).toSet
    val viaExternal = SubstrDedup.dupSpans(
        pagePair.select($"doc_id", NfcNormalize($"text").as("text")))
      .collect().map(_.toSeq).toSet
    assert(viaFlag == viaExternal && viaFlag.nonEmpty)
    assert(SubstrDedup.dupSpans(pagePair).count() == 0L,
      "raw substring detection must see nothing on an all-accented pair")
  }

  test("SQL surface nfc_normalize == Column over the fixture; eval == codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("nfc_fixture_docs")
    val diff = spark.sql("SELECT doc_id, nfc_normalize(text) AS a FROM nfc_fixture_docs")
      .join(fixture.select($"doc_id", NfcNormalize($"text").as("b")), Seq("doc_id"))
      .filter($"a" =!= $"b")
    assert(diff.count() == 0L)
    // interpreted eval == codegen path on the edge docs
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.NfcNormalize(
      BoundReference(0, StringType, nullable = true))
    val texts = fixture.filter($"doc_id" >= 5000L).orderBy($"doc_id")
      .select($"text").as[String].collect()
    val viaEval = texts.map(t => expr.eval(
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(t))).toString)
    val viaCodegen = texts.toSeq.toDF("t")
      .select(NfcNormalize($"t")).as[String].collect().toSeq
    assert(viaEval.toSeq == viaCodegen)
  }
}
