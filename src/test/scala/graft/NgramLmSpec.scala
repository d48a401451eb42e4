package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramLm

/** Pins the bigram-LM scoring operator:
  *   - scores on a tiny corpus match an independent Scala reimplementation
  *     of the whole model (counts, add-one smoothing, milli_log2);
  *   - gibberish ranks strictly above corpus-typical text in average
  *     surprisal (the property the curation threshold relies on);
  *   - a FOREIGN model scores unseen tokens/bigrams at the smoothing
  *     floor instead of failing;
  *   - docs with fewer than two tokens keep explicit zero rows.
  */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Independent milli_log2: floor(log2) from bit length + one-shift
    * linear interpolation — the documented formula, reimplemented on
    * plain Longs.
    */
  private def mlog2(x: Long): Long = {
    require(x >= 1)
    val blm1 = 63 - java.lang.Long.numberOfLeadingZeros(x)
    blm1 * 1000L + ((x * 1000L) >> blm1) - 1000L
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  test("scores on a tiny corpus match an independent reimplementation") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "a dog sat"),
      (4L, "solo"),      // one token: zero row
      (5L, ""))          // no tokens: zero row
    val df = corpus.toDF("doc_id", "text")
    val got = NgramLm.score(df, NgramLm.train(df)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // reference model on Scala collections
    val allToks = corpus.flatMap(c => toks(c._2))
    val uni = allToks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bigrams = corpus.flatMap(c => toks(c._2).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val bi = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = uni.size.toLong
    val expected = corpus.map { case (id, t) =>
      val bs = toks(t).sliding(2).filter(_.size == 2).toSeq
        .map(p => mlog2(uni(p(0)) + v) - mlog2(bi((p(0), p(1))) + 1))
      id -> (bs.size.toLong, bs.sum, if (bs.nonEmpty) bs.sum / bs.size else 0L)
    }.toMap
    assert(got == expected, s"got $got\nexpected $expected")
    assert(got(4L) == ((0L, 0L, 0L)) && got(5L) == ((0L, 0L, 0L)))
  }

  test("gibberish scores strictly above corpus-typical text") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val model = NgramLm.train(docs)
    // typical: a doc stitched from the corpus's most frequent bigram,
    // repeated; gibberish: letter soup no corpus doc contains
    val top = model.bigrams.orderBy(desc("c12"), asc("w1"), asc("w2"))
      .limit(1).collect().head
    val typical = (Seq.fill(20)(Seq(top.getString(0), top.getString(1))).flatten).mkString(" ")
    val probe = Seq((9000001L, typical),
      (9000002L, "xq zvk wjj qqx vbz kxq zzv jwx qzk vxz bzz kqx")).toDF("doc_id", "text")
    val s = NgramLm.score(probe, model).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(9000002L) > s(9000001L),
      s"gibberish ${s(9000002L)} must out-surprise typical ${s(9000001L)}")
  }

  test("merge of disjoint-corpus models EQUALS the full-corpus model, scores included") {
    import spark.implicits._
    val all = Tables.documents(spark, sf).select($"doc_id", $"text")
    val a = all.filter($"doc_id" % 2 === 0)
    val b = all.filter($"doc_id" % 2 === 1)
    val full = NgramLm.train(all)
    val merged = NgramLm.merge(NgramLm.train(a), NgramLm.train(b))
    assert(merged.vocab == full.vocab)
    assert(merged.unigrams.exceptAll(full.unigrams).isEmpty &&
      full.unigrams.exceptAll(merged.unigrams).isEmpty, "unigram tables diverge")
    assert(merged.bigrams.exceptAll(full.bigrams).isEmpty &&
      full.bigrams.exceptAll(merged.bigrams).isEmpty, "bigram tables diverge")
    // and therefore scoring is identical
    val probe = all.limit(20)
    val sFull = NgramLm.score(probe, full).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sMerged = NgramLm.score(probe, merged).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sFull == sMerged)
  }

  test("a foreign model scores unseen material at the smoothing floor") {
    import spark.implicits._
    val model = NgramLm.train(Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"))
    val out = NgramLm.score(Seq((2L, "delta epsilon")).toDF("doc_id", "text"), model)
      .collect().head
    // one bigram, both tokens unseen: bits = mlog2(0 + V) - mlog2(0 + 1)
    val v = 3L
    assert(out.getLong(1) == 1L)
    val expected = {
      val blm1 = 63 - java.lang.Long.numberOfLeadingZeros(v)
      blm1 * 1000L + ((v * 1000L) >> blm1) - 1000L
    }
    assert(out.getLong(2) == expected, s"got ${out.getLong(2)}, expected $expected")
  }
}
