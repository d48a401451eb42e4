package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CcnetServing, LangId, SubstrDedup, TokenDecontam}
import graft.queries.PipelineQueries

/** Pins the q228 incremental second wave: the composed incremental
  * pass (persisted anchors + token-window index + frozen CCNet pair +
  * LID artifact) equals a from-scratch build on wave1 ∪ wave2
  * BIT-FOR-BIT, the late benchmark retroactively contaminates a wave-1
  * doc through the index alone, the cross-wave duplicate is caught
  * without re-reading untouched wave-1 docs, and every state guard
  * refuses a skewed probe by name.
  */
class IncrementalWaveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val st = PipelineQueries.incrementalStages(spark)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("incremental manifest == from-scratch Spark build on the union, bit-for-bit") {
    // the from-scratch twin: same operators, NO persisted state — all
    // docs in one corpus, the full bench set at once, cuts still
    // estimated on wave 1 only (the frozen-pair rule)
    val docsAll = st.wave1.unionByName(st.wave2)
    val benchAll = st.bench1.unionByName(st.bench2)
    val lid = LangId.load(spark, st.lidDir)
    val pred = LangId.predict(docsAll, lid)
      .select(col("doc_id"), col("pred_lang"))
    val lm = graft.operators.NgramLm.train(st.wave1)
    val scoredAll = docsAll.join(pred, "doc_id")
      .select(col("doc_id"), col("pred_lang").as("lang"))
      .join(graft.operators.NgramLm.score(docsAll, lm)
        .select(col("doc_id"), col("avg_millibits")), Seq("doc_id"))
    val cuts = graft.queries.CurationQueries.ccnetCuts(
      scoredAll.filter(col("doc_id") < 1000L))
    val tagged = graft.queries.CurationQueries.ccnetTag(scoredAll, cuts)
    val spans = SubstrDedup.dupSpans(docsAll)
    val contaminatedIds = TokenDecontam
      .contaminationTokenSpans(docsAll, benchAll)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val permille = docsAll
      .select(col("doc_id"), length(col("text")).cast("long").as("tc"))
      .join(spans.groupBy("doc_id").agg(sum("span_len").as("dc")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("tc") === 0L, 0L)
          .otherwise(expr("(coalesce(dc, 0L) * 1000) div tc"))
          .as("dup_permille"))
    val scratch = tagged.join(permille, "doc_id")
      .collect().map { r =>
        val id = r.getAs[Long]("doc_id")
        val cont = if (contaminatedIds.contains(id)) 1L else 0L
        val keep = if (cont == 0L && r.getAs[Long]("dup_permille") <= 300L &&
          r.getAs[String]("bucket") != "tail") 1L else 0L
        (id, if (id < 1000L) 1L else 2L, r.getAs[String]("lang"),
          r.getAs[String]("bucket"), r.getAs[Long]("avg_millibits"),
          r.getAs[Long]("dup_permille"), cont, keep)
      }.toSet
    val incremental = st.manifest.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(incremental == scratch,
      s"diff: ${(incremental -- scratch).take(3)} vs ${(scratch -- incremental).take(3)}")
  }

  test("the late benchmark retroactively contaminates wave-1 doc 106 THROUGH THE INDEX — it was clean at wave-1 time") {
    assert(!ids(st.tokSpansW1).contains(106L),
      "106 must be clean when wave 1 is processed (9501 hasn't arrived)")
    assert(ids(st.tokSpansNewBench) == Set(106L),
      "the late benchmark must claim exactly doc 106 via the persisted index")
    val man = st.manifest.collect()
      .map(r => r.getLong(0) -> (r.getLong(6), r.getLong(7))).toMap
    assert(man(106L)._1 == 1L && man(106L)._2 == 0L,
      "106 must be contaminated and dropped in the two-wave manifest")
    // 1901 is caught by the ORIGINAL benchmark on the wave-2 leg
    assert(man(1901L)._1 == 1L && man(1901L)._2 == 0L)
    // clean wave-1 docs stay clean
    assert(man(0L)._1 == 0L)
  }

  test("the cross-wave duplicate: 1900 and the TOUCHED old doc 105 both carry spans over the permille line; untouched wave-1 docs never re-enter") {
    val incIds = ids(st.spansInc)
    assert(Set(105L, 1900L).subsetOf(incIds),
      s"the incremental span pass must see the new doc AND the touched old doc: $incIds")
    assert(incIds.forall(_ < 9000L),
      s"benchmark ids must never enter the span corpus: $incIds")
    // only the genuinely-touched wave-1 doc appears — the pass never
    // drags untouched wave-1 docs back in
    assert((incIds - 1900L).filter(_ < 1000L) == Set(105L),
      s"untouched wave-1 docs re-entered the incremental pass: $incIds")
    val man = st.manifest.collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(7))).toMap
    assert(man(105L)._1 > 300L && man(105L)._2 == 0L, s"105: ${man(105L)}")
    assert(man(1900L)._1 > 300L && man(1900L)._2 == 0L, s"1900: ${man(1900L)}")
    assert(man(0L)._1 == 0L && man(107L)._1 == 0L, "clean docs carry no spans")
  }

  test("streaming waves: micro-batched ingestion with a GROWING anchor state == the one-shot incremental pass, incl. a cross-batch duplicate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two stream-only docs sharing three >= 40-char lines, arriving in
    // DIFFERENT micro-batches: only a state that grows batch-by-batch
    // (append each batch's anchors after probing — the production
    // continuous-ingestion shape) can see the pair at all
    val shared = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today.",
      "every continuous ingestion wave appends its anchors to the state table.",
      "probing before appending keeps the disjointness contract intact here.")
    val extraA = (2900L, (shared :+
      "batch one carries this fresh closing line nobody else shares.").mkString("\n"))
    val extraB = (2901L, (shared :+
      "batch two ends with a different unshared closing line instead.").mkString("\n"))
    val w2rows = st.wave2.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batch1 = w2rows.filter(_._1 % 2 == 0) :+ extraA
    val batch2 = w2rows.filter(_._1 % 2 == 1) :+ extraB
    // the streamed pass
    var state = st.anchors1
    var corpus = st.wave1
    val streamedSpans = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch frame dies with the micro-batch — freeze it first
        val docs = b.localCheckpoint(true)
        val spans = SubstrDedup.dupSpansAgainst(docs, corpus, state)
        streamedSpans ++= spans
          .select(col("doc_id"), col("span_start"), col("span_end"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        state = SubstrDedup.anchors(docs).unionByName(state)
          .localCheckpoint(true)
        corpus = corpus.unionByName(docs).localCheckpoint(true)
      }
      .start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // one-shot reference: the whole second wave in one incremental pass
    val oneShot = SubstrDedup.dupSpansAgainst(
      st.wave2.unionByName(Seq(extraA, extraB).toDF("doc_id", "text")),
      st.wave1, st.anchors1)
    def merged(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      SubstrDedup.mergeSpans(df)
        .select(col("doc_id"), col("span_start"), col("span_end"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamedMerged = merged(streamedSpans.toSeq
      .toDF("doc_id", "span_start", "span_end")
      .withColumn("span_len", col("span_end") - col("span_start") + 1))
    val oneShotMerged = merged(oneShot)
    assert(streamedMerged == oneShotMerged,
      s"streamed-union vs one-shot diff: ${(streamedMerged -- oneShotMerged).take(3)} " +
        s"vs ${(oneShotMerged -- streamedMerged).take(3)}")
    // the cross-batch pair was genuinely caught (and only catchable by
    // the grown state: 2900 was in NO persisted state when it arrived)
    val spanDocs = streamedMerged.map(_._1)
    assert(spanDocs.contains(2900L) && spanDocs.contains(2901L),
      s"cross-batch duplicate pair missed: $spanDocs")
    assert(Set(105L, 1900L).subsetOf(spanDocs))
  }

  test("every state guard refuses a skewed probe by name") {
    // (a) anchor normalization-mode mismatch
    val eNorm = intercept[IllegalArgumentException] {
      SubstrDedup.dupSpansAgainst(st.wave2, st.wave1, st.anchors1,
        normalize = true)
    }
    assert(eNorm.getMessage.contains("normalize"), eNorm.getMessage)
    // (b) window-length mismatch against the persisted index
    val eN = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(st.bench2, st.winIdx1,
        n = 12)
    }
    assert(eN.getMessage.contains("12"), eN.getMessage)
    // (c) tokenizer-fingerprint mismatch (a different merges table)
    val eTok = intercept[IllegalArgumentException] {
      TokenDecontam.contaminationTokenSpansAgainst(st.bench2, st.winIdx1,
        merges = graft.operators.Bpe.StandardMerges.take(3))
    }
    assert(eTok.getMessage.toLowerCase.contains("tokenizer"), eTok.getMessage)
    // (d) LID gram-length skew
    val eLid = intercept[IllegalArgumentException] {
      LangId.requireCompatible(LangId.load(spark, st.lidDir), 3)
    }
    assert(eLid.getMessage.contains("2-gram"), eLid.getMessage)
    // (e) the pair's blob-swap refusal is CcnetPairSpec's (same gate,
    // same artifact format) — here we pin that the happy-path load of
    // THIS pair verifies the pairing identity
    val pair = CcnetServing.load(spark, st.pairDir)
    assert(pair.cuts.columns.contains("cut_head"))
  }
}
