package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LangId
import graft.queries.PipelineQueries

/** Pins the q227 supervised quality classifier (the FineWeb-Edu/DCLM
  * stage built on the label-agnostic NB kernel): the ArtifactStore
  * round-trip reproduces every prediction bit-for-bit, the planted
  * promotional page is caught by NO other manifest signal, and the
  * converse gate casualty is classifier-good — the two newest signals
  * are independent in both directions.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val qs = PipelineQueries.qualityStages(spark)

  test("train -> save -> load reproduces every prediction bit-for-bit (the ArtifactStore leg)") {
    val dir = java.nio.file.Files.createTempDirectory("quality_model").toString
    val model = PipelineQueries.qualityModel(spark)
    LangId.save(model, dir)
    val loaded = LangId.load(spark, dir)
    assert(loaded.vocab == model.vocab && loaded.n == model.n)
    val orig = qs.cls.collect().map(_.toSeq).toSet
    val re = LangId.predict(qs.corpus, loaded).collect().map(_.toSeq).toSet
    assert(re == orig, "loaded model must reproduce every prediction")
    // and the gram-length guard still refuses a skewed caller by name
    val e = intercept[IllegalArgumentException] {
      LangId.requireCompatible(loaded, 3)
    }
    assert(e.getMessage.contains("2-gram"), e.getMessage)
  }

  test("the promo page is caught by NO other signal; the gate casualty is classifier-good; margins grade every doc") {
    val man = qs.manifest.collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d100 = man(100L)
    assert(d100.getAs[Long]("pass_gate") == 1L, "100 must pass the gate")
    assert(d100.getAs[Long]("has_pii") == 0L)
    assert(d100.getAs[Long]("is_victim") == 0L)
    assert(d100.getAs[Long]("substr_permille") == 0L)
    assert(d100.getAs[Long]("avg_millibits") <=
      graft.queries.CurationQueries.LmKeepMaxAvgMillibits,
      "the self-trained LM must NOT catch the promo page (q212 lesson)")
    assert(d100.getAs[String]("cls_label") == "bad" &&
      d100.getAs[Long]("keep") == 0L,
      "ONLY the classifier may catch the promo page")
    // the converse: 140 is good prose the gate catches — the classifier
    // must not be a disguised word-count heuristic
    val d140 = man(140L)
    assert(d140.getAs[String]("cls_label") == "good" &&
      d140.getAs[Long]("pass_gate") == 0L &&
      d140.getAs[Long]("keep") == 0L, s"140: $d140")
    // 141 carries PII, classifier-good, dropped by the PII signal
    assert(man(141L).getAs[String]("cls_label") == "good" &&
      man(141L).getAs[Long]("has_pii") == 1L &&
      man(141L).getAs[Long]("keep") == 0L)
    // every clean corpus doc is classifier-good and kept; every margin
    // is a strictly positive grade (the NB total for the losing class
    // genuinely exceeds the winner's)
    (0L until 60L).foreach { id =>
      assert(man(id).getAs[String]("cls_label") == "good", s"doc $id")
      assert(man(id).getAs[Long]("keep") == 1L, s"doc $id must be kept")
      assert(man(id).getAs[Long]("cls_margin") > 0L, s"doc $id margin")
    }
    assert(d100.getAs[Long]("cls_margin") > 0L,
      "the promo page must be confidently bad, not a tie")
  }

  test("graded tier (q229): the binary extreme-grades model CANNOT rank the mid pair; only the grade threshold separates it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gs = PipelineQueries.gradedStages(spark)
    val man = gs.manifest.collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // (a) the planted grade-1/grade-2 docs are signal-clean under ALL
    // six q212 signals — the grade is the only thing separating them
    Seq(110L, 111L).foreach { id =>
      val r = man(id)
      assert(r.getAs[Long]("pass_gate") == 1L
        && r.getAs[Long]("has_pii") == 0L
        && r.getAs[Long]("is_victim") == 0L
        && r.getAs[Long]("substr_permille") <= 300L
        && r.getAs[Long]("avg_millibits") <=
             graft.queries.CurationQueries.LmKeepMaxAvgMillibits,
        s"doc $id must be signal-clean under the six q212 signals: $r")
    }
    assert(man(110L).getAs[Long]("cls_grade") == 1L
      && man(110L).getAs[Long]("keep") == 0L, s"110: ${man(110L)}")
    assert(man(111L).getAs[Long]("cls_grade") == 2L
      && man(111L).getAs[Long]("keep") == 1L, s"111: ${man(111L)}")
    // the q227 plants carry over: promo grades 0; the gate casualty
    // grades 3 but drops (independence in both directions)
    assert(man(100L).getAs[Long]("cls_grade") == 0L
      && man(100L).getAs[Long]("keep") == 0L)
    assert(man(140L).getAs[Long]("cls_grade") == 3L
      && man(140L).getAs[Long]("pass_gate") == 0L
      && man(140L).getAs[Long]("keep") == 0L)
    (0L until 60L).foreach { id =>
      assert(man(id).getAs[Long]("cls_grade") == 3L
        && man(id).getAs[Long]("keep") == 1L, s"doc $id")
    }
    // (b) the binary model trained on the EXTREME grades only (the
    // q227 shape: 0 -> bad, 3 -> good) cannot rank the mid pair IN
    // PRINCIPLE: the pair's filler letters occur nowhere in the binary
    // training text, its stopword sequence and gram counts are shared,
    // so the two docs score gram-for-gram IDENTICALLY under both
    // binary classes — same label, same total, same margin. A binary
    // gate structurally cannot rank grade 1 against grade 2, which is
    // WHY the published stage (FineWeb-Edu) is graded.
    val fx = spark.read.parquet(
      PipelineQueries.GradedQualityFixture.ensure(spark))
    val bin = LangId.train(
      fx.filter($"doc_id" >= 30000L && $"label".isin("0", "3"))
        .withColumn("label", when($"label" === "3", "good").otherwise("bad")),
      langCol = "label")
    val pb = LangId.predict(
        gs.corpus.filter($"doc_id".isin(110L, 111L)), bin)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(pb(110L) == pb(111L),
      s"the binary model must score the mid pair identically: $pb")
    // (c) the graded model round-trips bit-for-bit (4-class artifact)
    val dir = java.nio.file.Files.createTempDirectory("graded_model").toString
    LangId.save(PipelineQueries.gradedModel(spark), dir)
    val reload = LangId.load(spark, dir)
    assert(LangId.predict(gs.corpus, reload).collect().map(_.toSeq).toSet
      == gs.cls.collect().map(_.toSeq).toSet)
  }
}
