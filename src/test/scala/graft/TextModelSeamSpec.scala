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

  test("artifact round-trip: file-loaded scorer == collected scorer bit-for-bit == NgramLm.score; byte-identical saves") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val model = NgramLm.train(docs)
    val scorer = TextModelSeam.localize(model)
    val dir = java.nio.file.Files.createTempDirectory("lm_artifact")
    val path = dir.resolve("bigram.glm").toString
    TextModelSeam.saveScorer(scorer, path)
    // integer-exact round trip of the model tables themselves
    val loaded = TextModelSeam.loadScorer(path)
    assert(loaded.vocab == scorer.vocab)
    assert(loaded.unigrams == scorer.unigrams)
    assert(loaded.bigrams == scorer.bigrams)
    // determinism: saving the same model again is byte-identical
    val path2 = dir.resolve("bigram2.glm").toString
    TextModelSeam.saveScorer(scorer, path2)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path2))))
    // the deployment shape end-to-end: executors score via the
    // file-loading per-partition factory (the closure carries only the
    // path), and the scores equal BOTH the collected-scorer seam run
    // and the join-based NgramLm.score
    val viaFile = TextModelSeam
      .scoreSafe(docs.as[(Long, String)], TextModelSeam.fileScorerFactory(path))
      .collect()
    assert(viaFile.forall(_.ok))
    val fileMap = viaFile
      .map(r => r.doc_id -> ((r.n_bigrams, r.total_millibits, r.avg_millibits))).toMap
    val viaJoin = NgramLm.score(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fileMap.size == 500)
    assert(fileMap == viaJoin,
      "file-artifact scoring must be bit-for-bit the join-based scorer")
  }

  test("corrupted, truncated, and foreign artifacts fail loudly at load") {
    import spark.implicits._
    val scorer = new TextModelSeam.BigramLmScorer(
      Map("alpha" -> 3L, "beta" -> 1L), Map(("alpha", "beta") -> 2L), 2L)
    val dir = java.nio.file.Files.createTempDirectory("lm_corrupt")
    val good = dir.resolve("good.glm")
    TextModelSeam.saveScorer(scorer, good.toString)
    // sanity: the good artifact loads and scores
    assert(TextModelSeam.loadScorer(good.toString)
      .score("alpha beta") == scorer.score("alpha beta"))
    // flip one payload byte -> CRC refuses
    val bytes = java.nio.file.Files.readAllBytes(good)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x40).toByte
    val flipped = dir.resolve("flipped.glm")
    java.nio.file.Files.write(flipped, bytes)
    val crcEx = intercept[IllegalArgumentException] {
      TextModelSeam.loadScorer(flipped.toString)
    }
    assert(crcEx.getMessage.contains("CRC"))
    // truncate -> declared/present length mismatch
    val truncated = dir.resolve("truncated.glm")
    java.nio.file.Files.write(truncated,
      java.nio.file.Files.readAllBytes(good).dropRight(5))
    val truncEx = intercept[IllegalArgumentException] {
      TextModelSeam.loadScorer(truncated.toString)
    }
    assert(truncEx.getMessage.contains("truncated"))
    // a foreign file -> magic check names the problem
    val foreign = dir.resolve("foreign.bin")
    java.nio.file.Files.write(foreign,
      "definitely not a model artifact".getBytes("UTF-8"))
    val magicEx = intercept[IllegalArgumentException] {
      TextModelSeam.loadScorer(foreign.toString)
    }
    assert(magicEx.getMessage.contains("not a bigram-LM artifact"))
    // a file shorter than the 16-byte header -> the path-named check
    // fires, never a bare EOFException from the header reads
    val stub = dir.resolve("stub.glm")
    java.nio.file.Files.write(stub, Array[Byte](0x47, 0x4C, 0x4D))
    val stubEx = intercept[IllegalArgumentException] {
      TextModelSeam.loadScorer(stub.toString)
    }
    assert(stubEx.getMessage.contains("header needs 16"),
      s"sub-header file must fail by name: ${stubEx.getMessage}")
    // and the WRITE side's modified-UTF-8 entry limit is a named check,
    // not a mid-stream UTFDataFormatException
    val monster = new TextModelSeam.BigramLmScorer(
      Map(("x" * 70000) -> 1L), Map.empty, 1L)
    val utfEx = intercept[IllegalArgumentException] {
      TextModelSeam.saveScorer(monster, dir.resolve("monster.glm").toString)
    }
    assert(utfEx.getMessage.contains("65535"))
    // and through the seam: a bad artifact kills the TASK loudly (load
    // happens per partition, outside the per-row quarantine — a broken
    // MODEL must never degrade into per-doc ok=false noise)
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text").as[(Long, String)]
    val sparkEx = intercept[org.apache.spark.SparkException] {
      TextModelSeam.scoreSafe(docs,
        TextModelSeam.fileScorerFactory(flipped.toString)).collect()
    }
    assert(sparkEx.getMessage.contains("CRC") ||
      Option(sparkEx.getCause).exists(_.getMessage.contains("CRC")))
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
