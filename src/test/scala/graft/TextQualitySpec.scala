package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQuality

class TextQualitySpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("compression ratio orders repetitive < prose < random; deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = Seq(
      (1L, "spam spam spam spam " * 50),                       // highly repetitive
      (2L, ("the quick brown fox jumps over the lazy dog and then " +
        "wanders through seventeen unrelated meadows discussing philosophy ") * 8),
      (3L, Array.fill(1000)(rnd.nextPrintableChar()).mkString) // incompressible
    ).toDF("doc_id", "text")
    val stats = TextQuality.compressionStats(docs).collect().sortBy(_.doc_id)
    assert(stats.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(stats.forall(s => s.comp_len > 0 && s.raw_len > 0))
    val Seq(rep, prose, random) = stats.map(_.ratio).toSeq
    assert(rep < prose && prose < random,
      s"expected repetitive < prose < random, got $rep / $prose / $random")
    assert(rep < 0.1 && random > 0.8)
    // deterministic across runs
    val again = TextQuality.compressionStats(docs).collect().sortBy(_.doc_id)
    assert(stats.map(s => (s.doc_id, s.comp_len)).toSeq ==
      again.map(s => (s.doc_id, s.comp_len)).toSeq)
  }

  test("gopher quality gate: hand-computed stats on the planted edge docs") {
    // q194 over the GopherFixture; the two docs planted for the gate:
    // 1009 is symbol-heavy spam, 1010 is 10 lines of stopword-bearing
    // prose built to clear every threshold. Stats verified by hand:
    //  1009 "# # trending # tags ... more ... spam # content #"
    //    words = 12 (5 '#', 2 '...', trending/tags/more/spam/content)
    //    chars = 5*1 + 2*3 + (8+4+4+4+7) = 38 -> mean 38000 div 12 = 3166
    //    symbols = 5 + 2 = 7 -> 7*1000 div 12 = 583 permille (> 100)
    //    alpha  = 5          -> 5*1000 div 12 = 416 permille (< 800)
    //    n_words 12 < 50, stop_hits 0 < 2           => gate 0
    //  1010 = 10 x "the data with value have more"
    //    n_words 60, chars 240 -> mean 4000 milli; symbols 0;
    //    alpha 1000; stop_hits 3 (the/with/have)    => gate 1
    //  1011 = 10 x "The data with, value have more" (tokenizer pin)
    //    chars 25/line -> mean 4166; stop_hits 2: "The" lowercases to
    //    a hit, "with," does NOT (punctuation is content)  => gate 1
    val rows = SparkEntry.queries("q194_gopher_quality")(spark, "unused")
      .filter("doc_id IN (1009, 1010, 1011)")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(rows(1009L) == ((12L, 3166L, 583L, 416L, 0L, 0L)),
      s"spam doc must fail the gate: ${rows(1009L)}")
    assert(rows(1010L) == ((60L, 4000L, 0L, 1000L, 3L, 1L)),
      s"prose doc must pass every threshold: ${rows(1010L)}")
    assert(rows(1011L) == ((60L, 4166L, 0L, 1000L, 2L, 1L)),
      s"tokenizer pin: The counts, with, does not: ${rows(1011L)}")
  }

  test("web-curation manifest: the keep bit composes positively (gate x PII x dedup)") {
    import spark.implicits._
    // the corpus-scale q200 row honestly reports keep = 0 everywhere
    // (stopword-poor synthetic text), which exercises only one side of
    // the bit — this drives the SAME factored body with a corpus where
    // every decision path fires: a clean passing doc, a passing doc
    // carrying PII, a gate-failing doc, and a near-dup pair whose
    // min-id survivor keeps while the victim drops
    val pass = Seq.fill(10)("the data with value have more").mkString(" ")
    val docs = Seq(
      (1L, "en", pass),                    // passes everything     -> keep 1
      (2L, "en", pass + " mail a@b.co"),   // passes gate, has PII  -> keep 0
      (3L, "en", "way too short"),         // fails the gate        -> keep 0
      (8L, "en", pass + " variant eight"), // dedup survivor        -> keep 1
      (9L, "en", pass + " variant nine")   // dedup victim          -> keep 0
    ).toDF("doc_id", "lang", "text")
    val pairs = Seq((8L, 9L)).toDF("doc_a", "doc_b")
    val rows = graft.queries.CurationQueries.webCurationManifest(docs, pairs)
      .select($"doc_id", $"pass_gate", $"has_pii", $"is_victim", $"keep", $"split")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows(1L) == ((1L, 0L, 0L, 1L)), s"clean passing doc: ${rows(1L)}")
    assert(rows(2L) == ((1L, 1L, 0L, 0L)), s"PII blocks keep: ${rows(2L)}")
    assert(rows(3L)._1 == 0L && rows(3L)._4 == 0L, s"gate blocks keep: ${rows(3L)}")
    assert(rows(8L) == ((1L, 0L, 0L, 1L)), s"survivor keeps: ${rows(8L)}")
    assert(rows(9L) == ((1L, 0L, 1L, 0L)), s"victim drops: ${rows(9L)}")
  }

  test("q204 fixture: every manifest decision path fires AT VOLUME (the oracle-gated twin of the hand pin)") {
    import spark.implicits._
    // the q204 CORRECTNESS row replays this corpus through DuckDB; this
    // spec pins the fixture's construction so it cannot silently
    // degenerate into exercising fewer paths (e.g. a generator change
    // that breaks the gate everywhere would still gate-match — both
    // engines would agree on the wrong corpus)
    val docs = spark.read.parquet(
      graft.queries.CurationQueries.CurationFixture.ensure(spark))
    val pairs = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3), 0.5)
    val m = graft.queries.CurationQueries.webCurationManifest(docs, pairs)
      .selectExpr("sum(keep)", "sum(1 - pass_gate)", "sum(has_pii)",
        "sum(is_victim)",
        "sum(case when has_pii = 1 and is_victim = 1 then 1 else 0 end)",
        "count(*)", "count(distinct split)", "count(distinct lang)")
      .head()
    // the 3000-block (q209's substring plants) raises keep by 4 (the
    // heavy/light pairs are clean on the FOUR-signal manifest — the
    // whole point is that only the fifth signal catches them) and PII
    // by 2 (3004/3005 carry the planted email); the 4000-block (q212's
    // out-of-domain plants) raises keep by 6 more for the same reason
    // one tier up — only the SIXTH signal catches those
    assert(m.getLong(0) == 210L, s"keep=1 volume: ${m.getLong(0)}")
    assert(m.getLong(1) == 100L, s"gate-fail volume: ${m.getLong(1)}")
    assert(m.getLong(2) == 122L, s"PII volume: ${m.getLong(2)}")
    assert(m.getLong(3) == 120L, s"victim volume: ${m.getLong(3)}")
    assert(m.getLong(4) == 20L, s"double-reason (PII+victim) volume: ${m.getLong(4)}")
    assert(m.getLong(5) == 532L && m.getLong(6) == 3L && m.getLong(7) == 2L)
  }

  test("q209 fixture: the five-signal manifest's substring paths fire at volume; the threshold is real") {
    import spark.implicits._
    val docs = spark.read.parquet(
      graft.queries.CurationQueries.CurationFixture.ensure(spark))
    val pairs = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3), 0.5)
    val spans = graft.operators.SubstrDedup.dupSpans(docs)
    val m5 = graft.queries.CurationQueries
      .webCurationManifest(docs, pairs, Some(spans))
    val rows = m5.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("pass_gate"), r.getAs[Long]("has_pii"),
        r.getAs[Long]("is_victim"), r.getAs[Long]("substr_permille"),
        r.getAs[Long]("keep")))).toMap
    // heavy pair: no near-dup pair fires (J ~ 0.32) yet half the doc is
    // verbatim-shared — ONLY the substring signal drops it
    for (id <- Seq(3000L, 3001L)) {
      val (gate, pii, victim, perm, keep) = rows(id)
      assert(gate == 1L && pii == 0L && victim == 0L,
        s"doc $id must be clean on the four-signal manifest: ${rows(id)}")
      assert(perm > 300L && keep == 0L,
        s"doc $id must be substring-flagged: ${rows(id)}")
    }
    // light pair: a real shared span, but under the threshold -> keeps
    for (id <- Seq(3002L, 3003L)) {
      val (gate, pii, victim, perm, keep) = rows(id)
      assert(gate == 1L && pii == 0L && victim == 0L)
      assert(perm > 0L && perm <= 300L && keep == 1L,
        s"doc $id must carry a sub-threshold span and keep: ${rows(id)}")
    }
    // substring + PII at once
    for (id <- Seq(3004L, 3005L)) {
      val (_, pii, _, perm, keep) = rows(id)
      assert(pii == 1L && perm > 300L && keep == 0L, s"doc $id: ${rows(id)}")
    }
    // the no-survivor stance: a near-dup ORIGINAL (kept by q204's
    // election) carries ~970 permille of verbatim mass and drops here
    val origs = (0 until 400).filter(_ % 4 == 3).map(_.toLong)
    assert(origs.forall(id => rows(id)._4 > 300L && rows(id)._5 == 0L),
      "one-word-changed originals must be substring-flagged")
    // keep volume: the i%4==0 clean class, the light pair, and the
    // 4000-block (substring-clean by construction — q212's point)
    val keepCount = rows.values.count(_._5 == 1L)
    assert(keepCount == 108L, s"five-signal keep volume: $keepCount")
    // and the four-signal manifest over the SAME corpus keeps 210 — the
    // fifth signal is doing real, attributable work
    val m4keep = graft.queries.CurationQueries
      .webCurationManifest(docs, pairs)
      .selectExpr("sum(keep)").head().getLong(0)
    assert(m4keep == 210L)
  }

  test("q212 fixture: the model signal catches the out-of-domain block every other signal passes; in-domain scores clear the threshold") {
    import spark.implicits._
    val docs = spark.read.parquet(
      graft.queries.CurationQueries.CurationFixture.ensure(spark))
    val pairs = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3), 0.5)
    val spans = graft.operators.SubstrDedup.dupSpans(docs)
    // the q212 model: trained on the in-domain reference blocks only
    // (the CCNet shape); self-training would hand the 4000-block its own
    // bigrams back and erase the signal
    val model = graft.operators.NgramLm.train(docs.filter($"doc_id" < 4000L))
    val scores = graft.operators.NgramLm.score(docs, model)
    val m6 = graft.queries.CurationQueries
      .webCurationManifest(docs, pairs, Some(spans), lmScores = Some(scores))
    val rows = m6.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("pass_gate"), r.getAs[Long]("has_pii"),
        r.getAs[Long]("is_victim"), r.getAs[Long]("substr_permille"),
        r.getAs[Long]("avg_millibits"), r.getAs[Long]("keep")))).toMap
    val thr = graft.queries.CurationQueries.LmKeepMaxAvgMillibits
    // the planted block: clean on EVERY other signal, dropped by this one
    for (id <- 4000L to 4005L) {
      val (gate, pii, victim, perm, avg, keep) = rows(id)
      assert(gate == 1L && pii == 0L && victim == 0L && perm == 0L,
        s"doc $id must be clean on the five-signal manifest: ${rows(id)}")
      assert(avg > thr && keep == 0L,
        s"doc $id must be model-flagged (avg $avg vs $thr): ${rows(id)}")
    }
    // every OTHER doc's score clears the threshold — the signal is
    // attributable: six-signal keep == five-signal keep minus the block
    val others = rows.filter(_._1 < 4000L).values
    assert(others.forall(_._5 <= thr),
      s"in-domain scores must clear the threshold; worst = ${others.map(_._5).max}")
    val keep6 = rows.values.count(_._6 == 1L)
    assert(keep6 == 102L, s"six-signal keep volume: $keep6")
    // the margin is real on both sides (not a knife-edge the next
    // fixture tweak flips): >= 300 millibits of air each way
    val maxIn = others.map(_._5).max
    val minOut = (4000L to 4005L).map(id => rows(id)._5).min
    assert(maxIn <= thr - 300L && minOut >= thr + 300L,
      s"threshold margin: in-domain max $maxIn, out-of-domain min $minOut, thr $thr")
  }

  test("q212 composes with the model-artifact leg: a file-loaded per-partition scorer drives the manifest identically to the join-based score") {
    import spark.implicits._
    // the full deployment shape, end-to-end: train the reference model,
    // localize + save it as the r14 binary artifact, score the corpus
    // through the per-partition file-loaded seam, thread THOSE scores
    // into the six-signal manifest — bit-for-bit the join-based path
    val docs = spark.read.parquet(
      graft.queries.CurationQueries.CurationFixture.ensure(spark))
    val pairs = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3), 0.5)
    val spans = graft.operators.SubstrDedup.dupSpans(docs)
    val model = graft.operators.NgramLm.train(docs.filter($"doc_id" < 4000L))
    val path = java.nio.file.Files.createTempDirectory("q212_lm")
      .resolve("ref.glm").toString
    graft.operators.TextModelSeam.saveScorer(
      graft.operators.TextModelSeam.localize(model), path)
    val viaArtifact = graft.operators.TextModelSeam.scoreSafe(
        docs.select($"doc_id", $"text").as[(Long, String)],
        graft.operators.TextModelSeam.fileScorerFactory(path))(spark)
      .toDF()
    assert(viaArtifact.filter(!$"ok").isEmpty, "no quarantined rows expected")
    def manifest(scores: org.apache.spark.sql.DataFrame) =
      graft.queries.CurationQueries
        .webCurationManifest(docs, pairs, Some(spans), lmScores = Some(scores))
        .collect().map(_.toSeq).toSet
    val a = manifest(viaArtifact.select($"doc_id", $"avg_millibits"))
    val b = manifest(graft.operators.NgramLm.score(docs, model))
    assert(a == b && a.nonEmpty,
      s"artifact-scored manifest diverged: ${a.size} vs ${b.size} rows")
  }

  test("runs distributed over the documents corpus with sane bounds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stats = TextQuality.compressionStats(docs).collect()
    assert(stats.length == 500)
    assert(stats.forall(s => s.ratio > 0.0 && s.ratio < 1.5))
  }
}
