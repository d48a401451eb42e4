package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CcnetServing, NgramLm, TextModelSeam}
import graft.queries.{CurationQueries, PipelineQueries}

/** Pins the persisted CCNet serving pair (model blob + frozen cuts as
  * ONE manifest-gated artifact): the loaded pair must tag bit-for-bit
  * like the in-session batch machinery, and every skew — including the
  * pair-specific blob-swap — must be refused by name.
  */
class CcnetPairSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val docs =
    spark.read.parquet(PipelineQueries.LangIdFixture.ensure(spark))
  private lazy val model = NgramLm.train(docs)
  private lazy val scorer = TextModelSeam.localize(model)
  private lazy val scored = docs.select(col("doc_id"), col("lang"))
    .join(NgramLm.score(docs, model)
      .select(col("doc_id"), col("avg_millibits")), Seq("doc_id"))
  private lazy val cuts = CurationQueries.ccnetCuts(scored)

  private def fresh(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toString
    CcnetServing.save(d, scorer, cuts)
    d
  }

  test("loaded pair tags == batch ccnetTag bit-for-bit; per-partition factory loads from the artifact") {
    val dir = fresh("ccnet_pair")
    val pair = CcnetServing.load(spark, dir)
    assert(pair.scorer.vocab == scorer.vocab)
    val batch = CurationQueries.ccnetTag(scored, cuts)
      .collect().map(_.toSeq).toSet
    val served = CcnetServing.tag(spark, docs, pair.cuts,
        CcnetServing.scorerFactory(dir))
      .collect().map(_.toSeq).toSet
    assert(served == batch,
      "frozen-pair serving must reproduce the batch tagging exactly")
    // the pair round-trips: re-saving the loaded pair produces an
    // identical manifest (sorted blob tables make this byte-stable)
    val dir2 = java.nio.file.Files.createTempDirectory("ccnet_pair2").toString
    CcnetServing.save(dir2, pair.scorer, pair.cuts)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "MANIFEST.json"))) ==
      om.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir2, "MANIFEST.json"))))
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "model.bin")),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir2, "model.bin"))),
      "re-saved model blob must be byte-identical")
  }

  test("every pair skew refused by name") {
    import java.nio.file.{Files, Paths}
    // (a) missing model half
    val dA = fresh("ccnet_nomodel")
    Files.delete(Paths.get(dA, "model.bin"))
    assert(intercept[IllegalArgumentException] { CcnetServing.load(spark, dA) }
      .getMessage.contains("model half is missing"))
    // (b) corrupted blob -> CRC gate
    val dB = fresh("ccnet_crc")
    val bPath = Paths.get(dB, "model.bin")
    val bb = Files.readAllBytes(bPath)
    bb(bb.length - 1) = (bb(bb.length - 1) ^ 0x10).toByte
    Files.write(bPath, bb)
    assert(intercept[IllegalArgumentException] { CcnetServing.load(spark, dB) }
      .getMessage.contains("CRC"))
    // (c) blob swapped from ANOTHER pair -> pairing check names it
    val dC = fresh("ccnet_swap")
    val other = TextModelSeam.localize(
      NgramLm.train(docs.filter(col("doc_id") < 1000L)))
    TextModelSeam.saveScorer(other, Paths.get(dC, "model.bin").toString)
    val eSwap = intercept[IllegalArgumentException] {
      CcnetServing.load(spark, dC)
    }
    assert(eSwap.getMessage.contains("foreign blob"), eSwap.getMessage)
    // (d) version skew
    val dD = fresh("ccnet_ver")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val mPath = Paths.get(dD, "MANIFEST.json")
    val mj = om.readTree(Files.readAllBytes(mPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    mj.put("version", 99)
    Files.write(mPath, om.writeValueAsBytes(mj))
    assert(intercept[IllegalArgumentException] { CcnetServing.load(spark, dD) }
      .getMessage.contains("version 99"))
    // (e) uncommitted cuts table
    val dE = fresh("ccnet_succ")
    Files.delete(Paths.get(dE, "cuts", "_SUCCESS"))
    assert(intercept[IllegalArgumentException] { CcnetServing.load(spark, dE) }
      .getMessage.contains("_SUCCESS"))
    // (f) a non-cuts frame refused at SAVE time
    val eSave = intercept[IllegalArgumentException] {
      CcnetServing.save(Files.createTempDirectory("ccnet_bad").toString,
        scorer, scored)
    }
    assert(eSave.getMessage.contains("cut_head"), eSave.getMessage)
  }

  test("tag refuses a language with no cuts row BY NAME (ADVICE r16 — an inner join would shrink the corpus silently)") {
    // one doc relabeled to a language the frozen pair never saw: the
    // tag pass must fail naming the language, not drop the doc
    val dir = fresh("ccnet_alien")
    val alien = docs.limit(1).withColumn("lang", lit("tlh"))
    val e = intercept[Exception] {
      CcnetServing.tag(spark, alien, cuts,
        CcnetServing.scorerFactory(dir)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("tlh") && msgs.contains("cuts table"), msgs.take(500))
  }

  test("a NULL cut value is its own defect, refused at save/load and diagnosed distinctly by tag (ADVICE r17)") {
    import spark.implicits._
    // a cuts row that EXISTS but whose cut values are null (an empty or
    // failed per-language estimation) is not a missing language — the
    // old guard misdiagnosed it as "no row in the cuts table"
    val nullCut = cuts.unionByName(
      Seq(("tlh", null.asInstanceOf[java.lang.Long],
        null.asInstanceOf[java.lang.Long]))
        .toDF("lang", "cut_head", "cut_middle"))
    // (a) save refuses to WRITE the defect, naming the language
    val eSave = intercept[IllegalArgumentException] {
      CcnetServing.save(
        java.nio.file.Files.createTempDirectory("ccnet_nullcut").toString,
        scorer, nullCut)
    }
    assert(eSave.getMessage.contains("tlh")
      && eSave.getMessage.contains("NULL cut value"), eSave.getMessage)
    // (b) an in-session tag over the defective frame (never crossed the
    // artifact gates) names the NULL-cut defect, not a missing row
    val alien = docs.limit(1).withColumn("lang", lit("tlh"))
    val eTag = intercept[Exception] {
      CcnetServing.tag(spark, alien, nullCut,
        CcnetServing.scorerFactory(fresh("ccnet_nullcut_tag"))).collect()
    }
    val msgs = Iterator.iterate(eTag: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("NULL cut value") && !msgs.contains("no row in"),
      msgs.take(500))
    // (c) a pair whose cuts were nulled AFTER save (older writer /
    // hand-edited table) is refused at LOAD by the same name
    val dir = fresh("ccnet_nullcut_load")
    nullCut.write.mode("overwrite").parquet(s"$dir/cuts")
    val eLoad = intercept[IllegalArgumentException] {
      CcnetServing.load(spark, dir)
    }
    assert(eLoad.getMessage.contains("NULL cut value"), eLoad.getMessage)
  }
}
