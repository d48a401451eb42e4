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

  test("runs distributed over the documents corpus with sane bounds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stats = TextQuality.compressionStats(docs).collect()
    assert(stats.length == 500)
    assert(stats.forall(s => s.ratio > 0.0 && s.ratio < 1.5))
  }
}
