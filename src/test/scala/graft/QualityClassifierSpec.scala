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
}
