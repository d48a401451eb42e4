package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{NgramLm, TextModelSeam}

/** Pins the text-model inference seam (the VideoSeam discipline for the
  * classifier slot):
  *   - seam scoring with the localized q192 model == the join-based
  *     NgramLm.score BIT-FOR-BIT over the real documents corpus;
  *   - a poison doc becomes an ok=false quarantine row (and only it);
  *   - the scorer factory runs once per PARTITION, not per row.
  */
class TextModelSeamSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession =
    GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("seam with the localized bigram LM == join-based NgramLm.score bit-for-bit") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val model = NgramLm.train(docs)
    val scorer = TextModelSeam.localize(model)
    val viaSeam = TextModelSeam
      .scoreSafe(docs.as[(Long, String)], () => scorer)
      .collect()
    assert(viaSeam.forall(_.ok), "no quarantines expected on the real corpus")
    val seamMap = viaSeam
      .map(r => r.doc_id -> ((r.n_bigrams, r.total_millibits, r.avg_millibits))).toMap
    val viaJoin = NgramLm.score(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(seamMap.size == 500 && viaJoin.size == 500)
    assert(seamMap == viaJoin,
      "seam scoring must equal the shuffle-join scorer exactly — same tokenizer, " +
        "same add-one fold, same integer milli-log2 kernel")
  }

  test("foreign docs (unseen tokens) take the add-one floor identically on both paths") {
    import spark.implicits._
    val model = NgramLm.train(Tables.documents(spark, sf))
    val scorer = TextModelSeam.localize(model)
    val foreign = Seq(
      (1L, "zzzzq unseen tokenstream entirely outside the vocabulary"),
      (2L, "one"),   // single token: no transition evidence -> zeros
      (3L, ""),      // empty
      (4L, "MIXED Case With 123 numbers and-punct!")
    ).toDF("doc_id", "text")
    val seam = TextModelSeam.scoreSafe(foreign.as[(Long, String)], () => scorer)
      .collect().map(r => r.doc_id -> ((r.n_bigrams, r.total_millibits))).toMap
    val join = NgramLm.score(foreign, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(seam == join)
    assert(seam(2L) == ((0L, 0L)) && seam(3L) == ((0L, 0L)))
  }

  test("a poison doc quarantines as ok=false; every other row still scores") {
    import spark.implicits._
    val poison = new TextModelSeam.TextScorer with Serializable {
      def score(text: String): TextModelSeam.TextScores = {
        if (text.contains("POISON")) sys.error("model exploded on this doc")
        TextModelSeam.TextScores(1L, 42L)
      }
    }
    val docs = Seq(
      (1L, "fine document"), (2L, "carries POISON inside"), (3L, "also fine")
    ).toDF("doc_id", "text").as[(Long, String)]
    val out = TextModelSeam.scoreSafe(docs, () => poison)
      .collect().map(r => r.doc_id -> r).toMap
    assert(!out(2L).ok && out(2L).error.contains("model exploded") &&
      out(2L).n_bigrams == -1L)
    assert(out(1L).ok && out(1L).total_millibits == 42L)
    assert(out(3L).ok)
  }

  test("the scorer factory runs once per partition, never per row") {
    import spark.implicits._
    val constructions = spark.sparkContext.longAccumulator("scorer_inits")
    val docs = (0 until 64).map(i => (i.toLong, s"doc number $i"))
      .toDF("doc_id", "text").repartition(4).as[(Long, String)]
    val out = TextModelSeam.scoreSafe(docs, () => {
      constructions.add(1L)
      new TextModelSeam.TextScorer with Serializable {
        def score(text: String) = TextModelSeam.TextScores(0L, 0L)
      }
    }).collect()
    assert(out.length == 64)
    assert(constructions.value == 4L,
      s"expected one construction per partition, got ${constructions.value}")
  }
}
