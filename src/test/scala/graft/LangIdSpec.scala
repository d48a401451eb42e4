package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangId
import graft.queries.PipelineQueries.LangIdFixture

/** Pins the language-ID operator beyond the q219 gate: an independent
  * plain-Scala Naive-Bayes reimplementation must equal the distributed
  * scores EXACTLY (integer milli-bits), the planted fixture edges must
  * resolve the way the q219 doc claims (five-way exact tie -> tie-break,
  * mixed doc -> small nonzero margin), and the ArtifactStore leg must
  * reload bit-for-bit with every skew/corruption refused by name.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val docs = spark.read.parquet(LangIdFixture.ensure(spark))
  private lazy val trainDocs =
    docs.filter(col("doc_id") % 1000 < 40 && col("doc_id") < 9000)
  private lazy val model = LangId.train(trainDocs, n = 2)

  // ---- independent reference implementation (plain Scala) ------------

  private def mlog2Ref(x: Long): Long = {
    require(x >= 1)
    val floor = 63 - java.lang.Long.numberOfLeadingZeros(x)
    floor * 1000L + ((x * 1000L) >> floor) - 1000L
  }
  private def gramsRef(text: String, n: Int): Seq[String] =
    if (text.length < n) Seq.empty
    else (0 to text.length - n).map(i => text.substring(i, i + n))

  test("distributed scores == plain-Scala NB fold exactly; predictions match recorded langs on every held-out doc") {
    val all = docs.select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val train = all.filter(t => t._1 % 1000 < 40 && t._1 < 9000)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    train.foreach { case (_, lang, text) =>
      gramsRef(text, 2).foreach(g =>
        counts((lang, g)) = counts.getOrElse((lang, g), 0L) + 1L)
    }
    val tots = counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocab = counts.keys.map(_._2).toSet.size.toLong
    // the fixture's equal-mass construction: every language total is
    // exactly 40 * (DocChars - 1) — the exact-tie edge's precondition
    tots.values.foreach(t =>
      assert(t == 40L * (LangIdFixture.DocChars - 1), s"unequal totals: $tots"))
    def scoreRef(text: String, lang: String): Long =
      gramsRef(text, 2).map { g =>
        mlog2Ref(tots(lang) + vocab) -
          mlog2Ref(counts.getOrElse((lang, g), 0L) + 1L)
      }.sum
    val got = LangId.score(docs, model)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = tots.keys.toSeq.sorted
    all.foreach { case (id, _, text) =>
      langs.foreach { l =>
        assert(got((id, l)) == scoreRef(text, l),
          s"doc $id lang $l: ${got((id, l))} != ref ${scoreRef(text, l)}")
      }
    }
    // held-out accuracy: every i in [40, 60) predicts its recorded lang
    val pred = LangId.predict(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    all.filter(t => t._1 % 1000 >= 40 && t._1 < 9000).foreach {
      case (id, lang, _) =>
        assert(pred(id)._1 == lang, s"held-out doc $id: ${pred(id)._1} != $lang")
    }
    // planted edges: 9901 five-way EXACT tie -> alphabetically-first
    // language at margin 0; 9902 mixed en/es -> small nonzero margin,
    // below every pure doc's margin
    assert(langs.map(l => got((9901L, l))).distinct.size == 1,
      "9901 must tie all languages exactly")
    assert(pred(9901L) == (("de", 0L)))
    val (mixLang, mixMargin) = pred(9902L)
    assert(mixLang == "en" && mixMargin > 0L)
    val pureMargins = all.filter(_._1 < 9000).map(t => pred(t._1)._2)
    assert(mixMargin < pureMargins.min,
      s"mixed-doc margin $mixMargin not below pure minimum ${pureMargins.min}")
  }

  test("zero-evidence docs: every language scores 0, tie-break picks the first language, margin 0") {
    import spark.implicits._
    val tiny = Seq((1L, "x"), (2L, "")).toDF("doc_id", "text")
    val pred = LangId.predict(tiny, model).orderBy("doc_id").collect()
    pred.foreach { r =>
      assert(r.getString(1) == "de" && r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"zero-evidence doc ${r.getLong(0)}: $r")
    }
  }

  test("incremental training: train(A ∪ B) == merge(train(A), train(B)) table-for-table") {
    val a = trainDocs.filter(col("doc_id") < 2000L)
    val b = trainDocs.filter(col("doc_id") >= 2000L)
    val merged = LangId.merge(LangId.train(a, n = 2), LangId.train(b, n = 2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(merged.counts) == rows(model.counts), "counts diverge")
    assert(rows(merged.totals) == rows(model.totals), "totals diverge")
    assert(merged.vocab == model.vocab && merged.n == model.n)
    // and therefore identical predictions
    assert(LangId.predict(docs, merged).collect().map(_.toSeq).toSet ==
      LangId.predict(docs, model).collect().map(_.toSeq).toSet)
    // gram-length skew refused by name
    val eN = intercept[IllegalArgumentException] {
      LangId.merge(model, LangId.train(trainDocs, n = 3))
    }
    assert(eN.getMessage.contains("cannot merge"), eN.getMessage)
  }

  test("save -> load == original predictions bit-for-bit; scalars survive") {
    val dir = java.nio.file.Files.createTempDirectory("langid_rt").toString
    LangId.save(model, dir)
    val loaded = LangId.load(spark, dir)
    assert(loaded.n == model.n && loaded.vocab == model.vocab)
    val a = LangId.predict(docs, model).collect().map(_.toSeq).toSet
    val b = LangId.predict(docs, loaded).collect().map(_.toSeq).toSet
    assert(a == b, "loaded model must predict identically")
    // re-save from the LOADED model: manifest content is identical
    val dir2 = java.nio.file.Files.createTempDirectory("langid_rt2").toString
    LangId.save(loaded, dir2)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "MANIFEST.json"))) ==
      om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir2, "MANIFEST.json"))))
  }

  test("skew and corruption refused by name") {
    import java.nio.file.{Files, Paths}
    def fresh(tag: String): String = {
      val d = Files.createTempDirectory(tag).toString
      LangId.save(model, d)
      d
    }
    // (a) no manifest at all
    val empty = Files.createTempDirectory("langid_empty").toString
    assert(intercept[IllegalArgumentException] { LangId.load(spark, empty) }
      .getMessage.contains("MANIFEST"))
    // (b) version skew names both versions
    val dV = fresh("langid_ver")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val mPath = Paths.get(dV, "MANIFEST.json")
    val mj = om.readTree(Files.readAllBytes(mPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    mj.put("version", 99)
    Files.write(mPath, om.writeValueAsBytes(mj))
    val eV = intercept[IllegalArgumentException] { LangId.load(spark, dV) }
    assert(eV.getMessage.contains("version 99"), eV.getMessage)
    // (c) missing scalar -> partial manifest named
    val dS = fresh("langid_scalar")
    val sPath = Paths.get(dS, "MANIFEST.json")
    val sj = om.readTree(Files.readAllBytes(sPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    sj.remove("vocab")
    Files.write(sPath, om.writeValueAsBytes(sj))
    assert(intercept[IllegalArgumentException] { LangId.load(spark, dS) }
      .getMessage.contains("n/vocab"))
    // (d) uncommitted table -> _SUCCESS gate
    val dT = fresh("langid_succ")
    Files.delete(Paths.get(dT, "counts", "_SUCCESS"))
    assert(intercept[IllegalArgumentException] { LangId.load(spark, dT) }
      .getMessage.contains("_SUCCESS"))
    // (e) gram-length skew refused before any join
    val eN = intercept[IllegalArgumentException] {
      LangId.requireCompatible(model, 3)
    }
    assert(eN.getMessage.contains("2-grams") &&
      eN.getMessage.contains("n=3"), eN.getMessage)
  }

  test("serving leg: localized scalar scorer == distributed predict bit-for-bit, batch and STREAMING") {
    import org.apache.spark.sql.functions.col
    // every fixture doc, planted edges included: the exact five-way tie
    // (margin 0, tie-break 'de') and the mixed low-margin doc must come
    // out of the per-partition scalar path identically
    // the fixture plus two crawl-reality rows: an astral-plane doc
    // (surrogate pairs — Spark's substring/length count CODE POINTS, so
    // a UTF-16-indexed scalar scorer would extract different grams) and
    // a null text (the distributed plan scores it as zero evidence; the
    // scalar path must not crash the serving task)
    import spark.implicits._
    val extra = Seq(
      (8000001L, "xx", "😀😁😂 über eau"),
      (8000002L, "xx", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text")
    val probe = docs.unionByName(extra)
    val batch = LangId.predict(probe, model)
      .select(col("doc_id"), col("pred_lang"), col("best_millibits"),
        col("margin_millibits"))
      .collect().map(_.toSeq).toSet
    val scorer = LangId.localize(model)
    val served = LangId.predictLocal(spark, probe, scorer)
      .collect().map(_.toSeq).toSet
    assert(served == batch,
      "the broadcast scalar scorer must reproduce the distributed argmin exactly")
    // the streaming twin: the SAME serving pass inside micro-batches —
    // the deployment shape a streaming router actually runs (the
    // distributed predict's multi-aggregation plan cannot)
    val rows = probe.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val streamed = LangId.predictLocal(spark,
      input.toDF().toDF("doc_id", "text"), scorer)
    val q = streamed.writeStream.format("memory")
      .queryName("langid_serve").outputMode("append").start()
    try {
      input.addData(rows.take(100))
      q.processAllAvailable()
      input.addData(rows.drop(100))
      q.processAllAvailable()
      val got = spark.table("langid_serve").collect().map(_.toSeq).toSet
      assert(got == batch,
        "chunked streaming serving must equal the batch predictions")
    } finally q.stop()
  }

  test("n=3 tier: a bigram-identical confusable pair — n=2 PROVABLY ties, n=3 separates; an n=2 caller refuses the n=3 artifact by name") {
    import spark.implicits._
    // Two Eulerian circuits over the SAME directed edge multiset
    // {ab, bc, ca, ac, cb, ba}, both anchored at 'a': the two words
    // have identical character-BIGRAM multisets — including the
    // space-adjacent grams, since both start and end with 'a' — but
    // distinct trigram sets ('cac' occurs only in the first, 'bab'
    // only in the second). The real-crawl analog is a confusable
    // language pair (sr/hr, id/ms) where character bigrams carry no
    // signal and the published routers move to longer grams.
    val wa = "abcacba"
    val wb = "acbabca"
    def doc(w: String): String = Seq.fill(6)(w).mkString(" ")
    val train = ((0 until 4).map(_ => ("aa", doc(wa))) ++
      (0 until 4).map(_ => ("bb", doc(wb)))).toDF("lang", "text")
    val tests = Seq((1L, doc(wa)), (2L, doc(wb))).toDF("doc_id", "text")
    // n=2: every (lang, gram) count and both totals are EQUAL between
    // the classes by construction, so both docs tie at margin 0 and
    // fall to the alphabetical tie-break — the bb doc misclassifies.
    // This is structural, not statistical: no amount of bigram data
    // separates the pair.
    val m2 = LangId.train(train, n = 2)
    val p2 = LangId.predict(tests, m2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(p2(1L) == (("aa", 0L)) && p2(2L) == (("aa", 0L)),
      s"n=2 must tie exactly on the confusable pair: $p2")
    // n=3: the distinctive trigrams separate both docs with a real
    // margin, through the artifact round-trip
    val m3 = LangId.train(train, n = 3)
    val dir = java.nio.file.Files.createTempDirectory("lid_n3").toString
    LangId.save(m3, dir)
    val l3 = LangId.load(spark, dir)
    val e = intercept[IllegalArgumentException] {
      LangId.requireCompatible(l3, 2)
    }
    assert(e.getMessage.contains("3-grams") && e.getMessage.contains("n=2"),
      e.getMessage)
    LangId.requireCompatible(l3, 3)
    val p3 = LangId.predict(tests, l3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(p3(1L)._1 == "aa" && p3(2L)._1 == "bb",
      s"n=3 must separate the pair: $p3")
    assert(p3(1L)._2 > 0L && p3(2L)._2 > 0L,
      s"n=3 margins must be real, not tie-breaks: $p3")
    // loaded == in-session at n=3, bit-for-bit
    assert(LangId.predict(tests, l3).collect().map(_.toSeq).toSet
      == LangId.predict(tests, m3).collect().map(_.toSeq).toSet)
  }
}
