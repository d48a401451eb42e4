package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineQueries

/** Pins the dir-parameterized deployment driver (VERDICT r17 #1): the
  * job reads REAL `.warc.gz` shard files and a persisted LID artifact,
  * and its materialized lake tables equal the memoized q226 stage
  * frames bit-for-bit — the job and the gated row share one copy of
  * every stage function, and this spec proves the sharing holds through
  * the file boundary (binaryFile scan, parquet round-trips, dynamic
  * partition overwrite). Round 19 adds the compact `cur_keys` dedup
  * state (the wave's exact-dedup leg provably never reads old text),
  * the cumulative spend ledger (global budget reading), the
  * initial-build keep manifest, and the wave commit marker.
  */
class CorpusBuildJobSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  // the fixture corpus muxed into real shard FILES — same grouping the
  // memoized build uses (floorDiv 16) and the same muxShard bytes
  private lazy val shardsDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cbj_shards")
    val docs = spark.read
      .parquet(PipelineQueries.MultiCrawlFixture.ensure(spark))
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    docs.groupBy(d => Math.floorDiv(d._1, 16L)).foreach { case (sid, recs) =>
      java.nio.file.Files.write(
        dir.resolve(f"shard-$sid%05d.warc.gz"),
        PipelineQueries.MultiChain.muxShard(recs))
    }
    dir.toString
  }

  // the frozen router artifact: trained exactly like the pretrained
  // q219 model (same split, same n) and persisted via the LangId leg
  private lazy val lidDir: String = {
    val docs = spark.read
      .parquet(PipelineQueries.LangIdFixture.ensure(spark))
    val model = graft.operators.LangId.train(
      docs.filter(col("doc_id") % 1000 < 40 && col("doc_id") < 9000))
    val dir = java.nio.file.Files.createTempDirectory("cbj_lid").toString
    graft.operators.LangId.save(model, dir)
    dir
  }

  private lazy val lakeDir: String =
    java.nio.file.Files.createTempDirectory("cbj_lake").toString

  private lazy val fxDocs: Map[Long, String] = {
    import spark.implicits._
    spark.read.parquet(PipelineQueries.MultiCrawlFixture.ensure(spark))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
  }

  private def writeShards(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cbj_wave")
    docs.groupBy(d => Math.floorDiv(d._1, 16L)).foreach { case (sid, recs) =>
      java.nio.file.Files.write(dir.resolve(f"shard-$sid%05d.warc.gz"),
        PipelineQueries.MultiChain.muxShard(recs))
    }
    dir.toString
  }

  private lazy val firstRun: Seq[CorpusBuildJob.StageResult] =
    CorpusBuildJob.run(spark, shardsDir, lakeDir, lidDir)

  private def tableSet(name: String, cols: Seq[String]) =
    spark.read.parquet(s"$lakeDir/$name")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
  private def frameSet(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  private val RunStageNames = Seq("extracted", "cleaned", "cur", "cur_keys",
    "anchors", "token_windows", "pred", "routed", "ccnet_pair", "tagged",
    "spans", "manifest", "allocation", "mixed", "alloc_spent")
  private val WaveStageNames = Seq("extracted", "cleaned", "cur", "cur_keys",
    "anchors", "token_windows", "pred", "routed", "tagged", "spans",
    "manifest", "mixed", "alloc_spent")

  test("job over real .warc.gz shard files == the memoized q226 frames, stage by stage, bit-for-bit") {
    val st = PipelineQueries.multiStages(spark)
    assert(firstRun.map(_.name) == RunStageNames)
    assert(tableSet("extracted", Seq("doc_id", "text"))
      == frameSet(st.extracted, Seq("doc_id", "text")))
    assert(tableSet("cur", Seq("doc_id", "text"))
      == frameSet(st.cur, Seq("doc_id", "text")))
    // the compact dedup state: exactly (doc_id, md5-of-text), no text
    assert(spark.read.parquet(s"$lakeDir/cur_keys").columns.toSeq
      == Seq("doc_id", "key"))
    assert(tableSet("cur_keys", Seq("doc_id", "key"))
      == frameSet(st.cur.select(col("doc_id"),
        md5(col("text")).as("key")), Seq("doc_id", "key")))
    val routedCols = Seq("doc_id", "pred_lang", "margin_millibits")
    assert(tableSet("routed", routedCols) == frameSet(st.routed, routedCols))
    val tagCols = Seq("doc_id", "lang", "avg_millibits", "bucket")
    assert(tableSet("tagged", tagCols) == frameSet(st.tagged, tagCols))
    val mixCols = Seq("doc_id", "pred_lang", "margin_millibits",
      "avg_millibits", "bucket", "n_tok", "tokens_before")
    assert(tableSet("mixed", mixCols) == frameSet(st.mixed, mixCols))
    // the mixed table is pred_lang-partitioned (per-language consumers
    // prune at directory level)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(lakeDir, "mixed"))
      .iterator().hasNext)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(lakeDir, "mixed", "pred_lang=en")))
    // both artifacts landed manifest-gated and loadable
    val pair = graft.operators.CcnetServing.load(spark, s"$lakeDir/ccnet_pair")
    assert(pair.cuts.count() == 5)
    val alloc = graft.operators.Sampling.loadAllocation(spark,
      s"$lakeDir/allocation")
    assert(alloc.seed == PipelineQueries.MultiChain.MixSeed)
    // the job's own allocation replays the gated row's mix exactly
    assert(frameSet(PipelineQueries.MultiChain.mixed(st.mixIn, alloc), mixCols)
      == frameSet(st.mixed, mixCols))
    // the SPEND LEDGER records exactly the realized per-cell token
    // spend of the mix, under this allocation's fingerprint; every
    // fixture cell's mass exceeds its budget, so every cell crossed
    // the line (spent >= budget)
    val fp = graft.operators.Sampling.allocationFingerprint(alloc)
    val spent = spark.read.parquet(s"$lakeDir/alloc_spent").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("spent_tokens"), r.getAs[String]("wave"),
          r.getAs[Long]("alloc_fp"))).toMap
    val mixSpend = spark.read.parquet(s"$lakeDir/mixed")
      .groupBy(col("pred_lang"), col("bucket"))
      .agg(sum(col("n_tok")).as("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("s")).toMap
    assert(spent.keySet == mixSpend.keySet)
    val budgets = alloc.cells.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        r.getAs[Long]("token_budget")).toMap
    spent.foreach { case (cell, (s, wave, f)) =>
      assert(s == mixSpend(cell) && wave == "" && f == fp, s"$cell -> $s")
      assert(s >= budgets(cell),
        s"fixture budgets are sized below cell mass, so $cell must cross")
    }
  }

  test("re-running the job over the same shards is idempotent (the dynamic-partition-overwrite discipline)") {
    val before = tableSet("mixed", Seq("doc_id", "pred_lang", "n_tok",
      "tokens_before"))
    val secondRun = CorpusBuildJob.run(spark, shardsDir, lakeDir, lidDir)
    assert(secondRun.map(r => (r.name, r.rows))
      == firstRun.map(r => (r.name, r.rows)),
      "a re-run must reproduce every stage row count")
    assert(tableSet("mixed", Seq("doc_id", "pred_lang", "n_tok",
      "tokens_before")) == before, "a re-run must not change the mix")
    // artifacts re-committed cleanly (manifest still gates)
    assert(graft.operators.Sampling.loadAllocation(spark,
      s"$lakeDir/allocation").seed == PipelineQueries.MultiChain.MixSeed)
  }

  test("initial-build MANIFEST PARITY: run()'s keep manifest == the derivation over the memoized q226 frames, same schema as a wave's") {
    import spark.implicits._
    firstRun
    val st = PipelineQueries.multiStages(spark)
    // the audit columns and the ONE shared keep rule, derived on the
    // oracle-gated memoized frames: within-corpus spans -> permille,
    // no registry -> contaminated = 0, keep = the q228 rule
    val expected = PipelineQueries.MultiChain.keepManifest(st.tagged,
      PipelineQueries.MultiChain.dupPermille(st.cur,
        graft.operators.SubstrDedup.dupSpans(st.cur)),
      contaminatedIds = None)
    val manCols = Seq("doc_id", "pred_lang", "bucket", "avg_millibits",
      "dup_permille", "contaminated", "keep")
    assert(spark.read.parquet(s"$lakeDir/manifest").columns.toSeq == manCols,
      "base and wave manifests must share one schema (union-consistent)")
    assert(tableSet("manifest", manCols) == frameSet(expected, manCols))
    // every curated doc carries a manifest row (full-corpus audit), and
    // with no registry nothing is contaminated
    assert(tableSet("manifest", Seq("doc_id")).map(_.head)
      == tableSet("tagged", Seq("doc_id")).map(_.head))
    assert(spark.read.parquet(s"$lakeDir/manifest")
      .filter($"contaminated" =!= 0L).count() == 0)
  }

  test("incremental wave: new shards against the prior lake's persisted states — dedup == from-scratch, global budget reading, per-wave mode") {
    import spark.implicits._
    firstRun // the prior lake must exist
    // the wave: one EXACT cross-wave duplicate (old doc 0's text under a
    // new id — only the old corpus's key state can see it), one NEAR
    // duplicate (old es doc 2000's lines reordered — every line is a
    // shared >= 40-char run only the anchor state can see), and six
    // fresh pure-language pages
    val langs = Vector("de", "en", "es", "fr", "zh")
    val wave = Seq(
      (20000L, fxDocs(0L)),
      (20001L, fxDocs(2000L).split("\n").reverse.mkString("\n"))) ++
      (0 until 6).map(i =>
        ((20010 + i).toLong,
          PipelineQueries.MultiCrawlFixture.doc(langs(i % 5), 987000L + i)))
    val dir2 = writeShards(wave)
    val inc = CorpusBuildJob.runIncremental(spark, dir2, lakeDir,
      lidDir, "wave2")
    assert(inc.map(_.name) == WaveStageNames)
    val waveDir = s"$lakeDir/waves/wave2"
    def waveSet(name: String, cols: Seq[String]) =
      spark.read.parquet(s"$waveDir/$name")
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    // a completed wave carries its commit marker
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(waveDir, "_WAVE_COMMITTED")))
    // (a) the exact duplicate died to the OLD corpus's keys; the near
    // duplicate and the fresh docs survived
    val curIds = waveSet("cur", Seq("doc_id")).map(_.head)
    assert(!curIds.contains(20000L), "exact cross-wave duplicate must die")
    assert(curIds.contains(20001L) && curIds.size == 7, s"cur ids: $curIds")
    // (b) incremental dedup == a FROM-SCRATCH election over the union
    // of both waves' cleaned tables, restricted to the new id space
    val unionCleaned = spark.read.parquet(s"$lakeDir/cleaned")
      .unionByName(spark.read.parquet(s"$waveDir/cleaned"))
    val fromScratch = PipelineQueries.MultiChain.nfcDedup(unionCleaned)
      .filter($"doc_id" >= 20000L)
      .select($"doc_id", $"text").collect().map(_.toSeq).toSet
    assert(waveSet("cur", Seq("doc_id", "text")) == fromScratch,
      "incremental dedup must equal the from-scratch union election")
    // (c) the near duplicate is caught ONLY through the anchor state:
    // dup_permille over the keep line, keep = 0; fresh docs stay clean
    val man = spark.read.parquet(s"$waveDir/manifest").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(man(20001L).getAs[Long]("dup_permille") > 300L
      && man(20001L).getAs[Long]("keep") == 0L, s"20001: ${man(20001L)}")
    (0 until 6).foreach { i =>
      val r = man((20010 + i).toLong)
      assert(r.getAs[Long]("dup_permille") <= 300L, s"fresh doc: $r")
      assert(r.getAs[Long]("keep")
        == (if (r.getAs[String]("bucket") != "tail") 1L else 0L), s"$r")
    }
    // base and wave manifests union to one consistent audit surface
    assert(spark.read.parquet(s"$waveDir/manifest").columns.toSeq
      == spark.read.parquet(s"$lakeDir/manifest").columns.toSeq)
    // (d) the GLOBAL budget reading (default): the initial build spent
    // every cell past its budget (fixture budgets sit below cell
    // mass), so this wave's remainder is zero everywhere — it selects
    // NOTHING and records zero spend; the corpus-wide spend is
    // unchanged, which IS the sum-over-waves <= realized-spend
    // invariant at this lake's state
    assert(spark.read.parquet(s"$waveDir/mixed").count() == 0,
      "exhausted cells must select nothing under the global reading")
    assert(spark.read.parquet(s"$waveDir/alloc_spent").count() == 0)
    // (e) idempotent re-run (its own spend rows are excluded from the
    // prior-state union, so the replay sees the same remainder)
    val again = CorpusBuildJob.runIncremental(spark, dir2, lakeDir,
      lidDir, "wave2")
    assert(again.map(r => (r.name, r.rows)) == inc.map(r => (r.name, r.rows)))
    // the EXPLICIT per-wave-quota mode: the wave re-spends the full
    // per-cell budgets — the mix selects kept docs again and records
    // its own spend rows stamped with the wave name
    val perWave = CorpusBuildJob.runIncremental(spark, dir2, lakeDir,
      lidDir, "wave2", cumulativeBudget = false)
    assert(perWave.map(_.name) == WaveStageNames)
    val mixedIds = waveSet("mixed", Seq("doc_id")).map(_.head.asInstanceOf[Long])
    assert(mixedIds.nonEmpty, "per-wave mode re-spends the full budgets")
    mixedIds.foreach(id => assert(man(id).getAs[Long]("keep") == 1L))
    val waveSpent = spark.read.parquet(s"$waveDir/alloc_spent").collect()
    assert(waveSpent.nonEmpty
      && waveSpent.forall(_.getAs[String]("wave") == "wave2"))
    // (f) the id-space gate refuses an overlapping wave by name; an
    // all-casualty wave refuses as a crawl defect, not a no-op
    val overlapDir = java.nio.file.Files.createTempDirectory("cbj_overlap")
    java.nio.file.Files.write(overlapDir.resolve("shard-00000.warc.gz"),
      PipelineQueries.MultiChain.muxShard(
        Seq((100L, PipelineQueries.MultiCrawlFixture.doc("en", 999111L)))))
    val eId = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark, overlapDir.toString, lakeDir,
        lidDir, "wave_bad")
    }
    assert(eId.getMessage.contains("id-space overlap"), eId.getMessage)
    val emptyDir = java.nio.file.Files.createTempDirectory("cbj_empty")
    java.nio.file.Files.write(emptyDir.resolve("shard-00000.warc.gz"),
      PipelineQueries.MultiChain.muxShard(
        Seq((30000L, "the config block uses the { symbol today."))))
    val eEmpty = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark, emptyDir.toString, lakeDir,
        lidDir, "wave_empty")
    }
    assert(eEmpty.getMessage.contains("ZERO post-clean"), eEmpty.getMessage)
  }

  test("wave 3 layers over wave 2's state: cross-wave dedup, anchor spans, and a retro flip all reach WAVE-2 docs; out-of-order replay refuses") {
    import spark.implicits._
    firstRun // lakeDir carries the initial build + wave2 (prior test)
    val langs = Vector("de", "en", "es", "fr", "zh")
    // wave-2 docs regenerate deterministically (same seeds the wave-2
    // test used) so this test is self-contained in content
    def w2doc(i: Int): String =
      PipelineQueries.MultiCrawlFixture.doc(langs(i % 5), 987000L + i)
    val wave3 = Seq(
      // 30000: EXACT duplicate of WAVE-2 doc 20010 — only the layered
      // union of cur keys can see it (the initial lake never did)
      (30000L, w2doc(0)),
      // 30001: three lines of WAVE-2 doc 20011 + two fresh — the
      // cross-wave near-dup only wave-2's ANCHOR state can see
      (30001L, (w2doc(1).split("\n").take(3) ++
        Seq(PipelineQueries.MultiCrawlFixture.line("en", 777333L, 0),
          PipelineQueries.MultiCrawlFixture.line("en", 777333L, 1)))
        .mkString("\n"))) ++
      (0 until 3).map(i =>
        ((30010 + i).toLong,
          PipelineQueries.MultiCrawlFixture.doc(langs(i), 444000L + i)))
    // B3 quotes two lines of WAVE-2 doc 20012 — the retro flip must
    // reach a WAVE-2 doc through wave-2's OWN persisted window state
    val b3 = w2doc(2).split("\n").slice(0, 2).mkString("\n")
    val benchDir3 = java.nio.file.Files
      .createTempDirectory("cbj_bench3").toString
    Seq((9000003L, b3)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir3)
    val inc3 = CorpusBuildJob.runIncremental(spark, writeShards(wave3),
      lakeDir, lidDir, "wave3", newBenchDir = Some(benchDir3))
    val w3 = s"$lakeDir/waves/wave3"
    val curIds = spark.read.parquet(s"$w3/cur")
      .select($"doc_id").as[Long].collect().toSet
    assert(!curIds.contains(30000L),
      "the wave-2 duplicate must die to the LAYERED cur keys")
    assert(curIds.contains(30001L) && curIds.size == 4, s"$curIds")
    val man = spark.read.parquet(s"$w3/manifest").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(man(30001L).getAs[Long]("dup_permille") > 300L
      && man(30001L).getAs[Long]("keep") == 0L, s"${man(30001L)}")
    val retro = spark.read.parquet(s"$w3/retro_contaminated")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(retro == Set(20012L),
      s"the retro flip must reach the WAVE-2 doc through layered state: $retro")
    // idempotent latest-wave re-run (wave3's own state is excluded
    // from the prior union)
    val again = CorpusBuildJob.runIncremental(spark, writeShards(wave3),
      lakeDir, lidDir, "wave3", newBenchDir = Some(benchDir3))
    assert(again.map(r => (r.name, r.rows)) == inc3.map(r => (r.name, r.rows)))
    // out-of-order replay: re-running wave2 NOW would dedup against
    // the future — the id-space gate refuses it by name instead
    val w2wave = Seq((20010L, w2doc(0)))
    val eOrder = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark, writeShards(w2wave), lakeDir,
        lidDir, "wave2")
    }
    assert(eOrder.getMessage.contains("id-space overlap"), eOrder.getMessage)
    // and the refused replay wrote NOTHING — wave2's tables are intact
    assert(spark.read.parquet(s"$lakeDir/waves/wave2/cur").count() == 7,
      "a refused run must leave the lake byte-identical")
  }

  test("state compaction absorbs wave state into the base tables — row-exact, idempotent, and future waves still see absorbed docs") {
    import spark.implicits._
    firstRun // lakeDir carries the initial build + waves 2 and 3
    val stateNames = Seq("cur", "cur_keys", "anchors", "token_windows",
      "bench", "alloc_spent")
    def unionCount(name: String): Long =
      Seq(s"$lakeDir/$name", s"$lakeDir/waves/wave2/$name",
          s"$lakeDir/waves/wave3/$name")
        .filter(p => java.nio.file.Files.exists(
          java.nio.file.Paths.get(p, "_SUCCESS")))
        .map(p => spark.read.parquet(p).count()).sum
    val expect = stateNames.map(n => n -> unionCount(n)).toMap
    val res = CorpusBuildJob.compactState(spark, lakeDir)
    // this lake has wave state for the always-on tables plus wave3's
    // benchmark registry and wave2's per-wave-mode spend rows
    assert(res.map(_.name) == stateNames, res.toString)
    res.foreach(r => assert(r.rows == expect(r.name),
      s"compaction must be row-exact: $r vs ${expect(r.name)}"))
    // absorbed wave copies are gone; re-compaction is a no-op
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(lakeDir, "waves/wave2/cur")))
    assert(CorpusBuildJob.compactState(spark, lakeDir).isEmpty)
    // a wave-4 duplicate of a WAVE-2 doc still dies: the absorbed
    // state kept its value through the rewrite
    val dup = PipelineQueries.MultiCrawlFixture.doc("en", 987001L)
    val wave4 = Seq((40000L, dup),
      (40001L, PipelineQueries.MultiCrawlFixture.doc("zh", 888111L)))
    val w4shards = writeShards(wave4)
    val inc4 = CorpusBuildJob.runIncremental(spark, w4shards, lakeDir,
      lidDir, "wave4")
    val cur4 = spark.read.parquet(s"$lakeDir/waves/wave4/cur")
      .select($"doc_id").as[Long].collect().toSet
    assert(cur4 == Set(40001L),
      s"the absorbed wave-2 duplicate must still die: $cur4")
    // compaction FREEZES absorbed waves: replaying wave3 (its ids now
    // live in the base tables) refuses at the id-space gate...
    val eFrozen = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark, writeShards(Seq(
          (30001L, PipelineQueries.MultiCrawlFixture.doc("fr", 99001L)))),
        lakeDir, lidDir, "wave3")
    }
    assert(eFrozen.getMessage.contains("id-space overlap"),
      eFrozen.getMessage)
    // ...while the NOT-yet-absorbed latest wave re-runs idempotently
    val again4 = CorpusBuildJob.runIncremental(spark, w4shards, lakeDir,
      lidDir, "wave4")
    assert(again4.map(r => (r.name, r.rows))
      == inc4.map(r => (r.name, r.rows)))
  }

  test("benchmark decontamination through the job: the registry drops at the mix; a LATE benchmark retro-flips old docs through the persisted index") {
    import spark.implicits._
    // B1 quotes two consecutive lines of fixture doc 1000 verbatim
    // (joined by the same \n, so the glued boundary token matches and
    // the shared run clears the 13-token window)
    val b1 = fxDocs(1000L).split("\n").slice(1, 3).mkString("\n")
    val benchDir1 = java.nio.file.Files
      .createTempDirectory("cbj_bench1").toString
    Seq((9000001L, b1)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir1)
    val lake2 = java.nio.file.Files.createTempDirectory("cbj_lake2").toString
    val r = CorpusBuildJob.run(spark, shardsDir, lake2, lidDir,
      benchDir = Some(benchDir1))
    assert(r.map(_.name) == Seq("extracted", "cleaned", "cur", "cur_keys",
      "anchors", "token_windows", "bench", "contaminated", "pred",
      "routed", "ccnet_pair", "tagged", "spans", "manifest", "allocation",
      "mixed", "alloc_spent"))
    // exactly the quoted host is recorded; it vanishes from the MIX but
    // stays on the tag table (the full-corpus audit surface), and the
    // base manifest records it contaminated with keep = 0
    val hit = spark.read.parquet(s"$lake2/contaminated")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(hit == Set(1000L), s"contaminated: $hit")
    val mixedIds = spark.read.parquet(s"$lake2/mixed")
      .select($"doc_id").as[Long].collect().toSet
    assert(!mixedIds.contains(1000L) && mixedIds.nonEmpty)
    assert(spark.read.parquet(s"$lake2/tagged")
      .filter($"doc_id" === 1000L).count() == 1)
    val baseMan1000 = spark.read.parquet(s"$lake2/manifest")
      .filter($"doc_id" === 1000L).collect()
    assert(baseMan1000.length == 1
      && baseMan1000.head.getAs[Long]("contaminated") == 1L
      && baseMan1000.head.getAs[Long]("keep") == 0L, baseMan1000.toSeq)

    // the LATE benchmark B2 (arrives with the wave) quotes OLD doc 3000
    // — it must flip 3000 contaminated RETROACTIVELY through the
    // PERSISTED window index, never by re-reading the corpus; and the
    // wave doc quoting B1 must flag against the INITIAL registry (the
    // union of everything known so far)
    val b2 = fxDocs(3000L).split("\n").slice(0, 2).mkString("\n")
    val benchDir2 = java.nio.file.Files
      .createTempDirectory("cbj_bench2").toString
    Seq((9000002L, b2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir2)
    val langs = Vector("de", "en", "es", "fr", "zh")
    val quoting = (PipelineQueries.MultiCrawlFixture.doc("en", 31337L)
      .split("\n").take(2) ++ b1.split("\n")).mkString("\n")
    val wave = Seq((20021L, quoting)) ++ (0 until 3).map(i =>
      ((20030 + i).toLong,
        PipelineQueries.MultiCrawlFixture.doc(langs(i), 555000L + i)))
    val waveShards = writeShards(wave)
    val inc = CorpusBuildJob.runIncremental(spark, waveShards,
      lake2, lidDir, "wave2", newBenchDir = Some(benchDir2))
    assert(inc.map(_.name) == Seq("extracted", "cleaned", "cur", "cur_keys",
      "anchors", "token_windows", "pred", "routed", "tagged", "spans",
      "bench", "retro_contaminated", "manifest", "mixed", "alloc_spent"))
    val retro = spark.read.parquet(s"$lake2/waves/wave2/retro_contaminated")
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(retro == Set(3000L), s"retro flips: $retro")
    val man = spark.read.parquet(s"$lake2/waves/wave2/manifest").collect()
      .map(r2 => r2.getAs[Long]("doc_id") -> r2).toMap
    assert(man(20021L).getAs[Long]("contaminated") == 1L
      && man(20021L).getAs[Long]("keep") == 0L, s"${man(20021L)}")
    (0 until 3).foreach { i =>
      assert(man((20030 + i).toLong).getAs[Long]("contaminated") == 0L)
    }
    // re-running the wave WITHOUT the benchmark RETRACTS its registry
    // (review r18: a stale waves/<w>/bench would keep feeding future
    // waves a benchmark this run's manifest ignores) — the wave doc
    // quoting B1 stays contaminated via the INITIAL registry alone
    CorpusBuildJob.runIncremental(spark, waveShards, lake2, lidDir, "wave2")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(lake2, "waves/wave2/bench")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(lake2, "waves/wave2/retro_contaminated")))
    val man2 = spark.read.parquet(s"$lake2/waves/wave2/manifest").collect()
      .map(r2 => r2.getAs[Long]("doc_id") -> r2).toMap
    assert(man2(20021L).getAs[Long]("contaminated") == 1L,
      "the initial registry still catches the B1 quote after retraction")
  }

  // ---- the round-19 structural proofs run on a small dedicated lake
  // (en + fr only, so the language-inventory gate has something real to
  // refuse) whose base `cur` TEXT gets deliberately corrupted after the
  // build — every later pass that still works proves it never read it.
  private lazy val miniLake: String = {
    val lake = java.nio.file.Files.createTempDirectory("cbj_mini").toString
    val docs = (0 until 12).map(i => (i.toLong,
        PipelineQueries.MultiCrawlFixture.doc("en", 52000L + i))) ++
      (0 until 12).map(i => ((100 + i).toLong,
        PipelineQueries.MultiCrawlFixture.doc("fr", 63000L + i)))
    CorpusBuildJob.run(spark, writeShards(docs), lake, lidDir)
    lake
  }

  test("the wave's exact-dedup leg reads ONLY the compact key state: a duplicate still dies after the old `cur` TEXT is destroyed") {
    import spark.implicits._
    // corrupt the base cur's text IN PLACE (keys stay real): if any
    // wave leg re-derived md5 from old text, the planted duplicate's
    // key would no longer match and it would silently survive
    assert(spark.read.parquet(s"$miniLake/cur_keys").columns.toSeq
      == Seq("doc_id", "key"), "the key state must carry no text")
    val corrupted = spark.read.parquet(s"$miniLake/cur")
      .select($"doc_id").as[Long].collect().toSeq
      .map(id => (id, "[text destroyed by CorpusBuildJobSpec]"))
    corrupted.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$miniLake/cur")
    // the wave: an EXACT duplicate of mini doc 0 plus a fresh doc
    val dupText = PipelineQueries.MultiCrawlFixture.doc("en", 52000L)
    val wave = Seq((90000L, dupText),
      (90001L, PipelineQueries.MultiCrawlFixture.doc("fr", 71000L)))
    CorpusBuildJob.runIncremental(spark, writeShards(wave), miniLake,
      lidDir, "waveA")
    val curIds = spark.read.parquet(s"$miniLake/waves/waveA/cur")
      .select($"doc_id").as[Long].collect().toSet
    assert(curIds == Set(90001L),
      s"the duplicate must die against the KEY state alone: $curIds")
    // and the layered key state the election consumed is text-free by
    // schema, base and wave alike
    Seq(s"$miniLake/cur_keys", s"$miniLake/waves/waveA/cur_keys").foreach {
      p => assert(spark.read.parquet(p).columns.toSeq == Seq("doc_id", "key"))
    }
  }

  test("wave COMMIT MARKER: a crashed wave's committed state tables do not layer, and compaction never absorbs them") {
    import spark.implicits._
    miniLake
    // simulate a wave that crashed after materializing cur/cur_keys but
    // before its manifest: per-table _SUCCESS exists, marker does not
    val phantomText = PipelineQueries.MultiCrawlFixture.doc("en", 81000L)
    val phantomDir = s"$miniLake/waves/phantom_crash"
    Seq((91000L, phantomText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$phantomDir/cur")
    Seq((91000L, phantomText)).toDF("doc_id", "text")
      .select($"doc_id", md5($"text").as("key"))
      .write.mode("overwrite").parquet(s"$phantomDir/cur_keys")
    // a duplicate of the phantom's doc arrives in a real wave: the
    // phantom's doc never entered the corpus, so it must SURVIVE — a
    // lake that layered the unmarked wave would silently kill it as a
    // "duplicate" of a doc that was never ingested (ADVICE r18)
    CorpusBuildJob.runIncremental(spark,
      writeShards(Seq((95000L, phantomText))), miniLake, lidDir, "waveB")
    val curIds = spark.read.parquet(s"$miniLake/waves/waveB/cur")
      .select($"doc_id").as[Long].collect().toSet
    assert(curIds == Set(95000L),
      s"an unmarked (crashed) wave's state must not layer: $curIds")
    // compaction absorbs the COMMITTED waves but leaves the phantom
    // untouched (its state is not corpus state)
    CorpusBuildJob.compactState(spark, miniLake)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(phantomDir, "cur", "_SUCCESS")),
      "compaction must not consume an uncommitted wave")
    val baseIds = spark.read.parquet(s"$miniLake/cur_keys")
      .select($"doc_id").as[Long].collect().toSet
    assert(!baseIds.contains(91000L)
      && baseIds.contains(95000L) && baseIds.contains(90001L),
      s"absorbed: real waves yes, phantom no — $baseIds")
  }

  test("language-inventory gate: a wave routing a language the frozen pair never saw refuses BY NAME before any write") {
    miniLake // en + fr only: the pair has no zh cuts, the mix no zh cells
    val e = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark,
        writeShards(Seq((97000L,
          PipelineQueries.MultiCrawlFixture.doc("zh", 930000L)))),
        miniLake, lidDir, "waveC")
    }
    assert(e.getMessage.contains("zh")
      && e.getMessage.contains("frozen pair"), e.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(miniLake, "waves", "waveC")),
      "the refusal must fire before the wave's first write")
  }

  test("spend-ledger fingerprint gate: spend recorded under a different allocation refuses by name") {
    import spark.implicits._
    miniLake
    // doctor the base ledger's fingerprint (collect-then-rewrite; the
    // ledger is per-cell rows, tiny by contract)
    val rows = spark.read.parquet(s"$miniLake/alloc_spent")
      .select($"lang", $"bucket", $"spent_tokens", $"wave", $"alloc_fp")
      .as[(String, String, Long, String, Long)].collect().toSeq
      .map { case (l, b, s, w, f) => (l, b, s, w, f + 1L) }
    rows.toDF("lang", "bucket", "spent_tokens", "wave", "alloc_fp")
      .write.mode("overwrite").parquet(s"$miniLake/alloc_spent")
    val e = intercept[IllegalArgumentException] {
      CorpusBuildJob.runIncremental(spark,
        writeShards(Seq((98000L,
          PipelineQueries.MultiCrawlFixture.doc("en", 940000L)))),
        miniLake, lidDir, "waveD")
    }
    assert(e.getMessage.contains("fingerprint"), e.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(miniLake, "waves", "waveD")))
  }

  test("a gram-length-skewed router artifact is refused by name BEFORE any shard work") {
    import spark.implicits._
    val m3 = graft.operators.LangId.train(
      Seq(("en", "abcdef"), ("fr", "ghijkl")).toDF("lang", "text"), n = 3)
    val badDir = java.nio.file.Files.createTempDirectory("cbj_lid3").toString
    graft.operators.LangId.save(m3, badDir)
    val e = intercept[IllegalArgumentException] {
      CorpusBuildJob.run(spark, shardsDir,
        java.nio.file.Files.createTempDirectory("cbj_lake2").toString, badDir)
    }
    assert(e.getMessage.contains("3-grams")
      && e.getMessage.contains("n=2"), e.getMessage)
  }
}
