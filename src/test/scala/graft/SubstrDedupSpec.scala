package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ChunkDedup, SubstrDedup}

/** Pins the exact-substring dedup tier (q201–q203):
  *   - the PLANTED CASE the CDC chunk tier provably misses: a 60-char
  *     verbatim span (shorter than the expected 64-char chunk, no CDC
  *     boundary inside it) shared at different offsets — crossDocChunks
  *     finds NOTHING on the pair, dupSpans finds exactly the span;
  *   - the winnowing guarantee in action: two-pass (anchor-pruned)
  *     dupSpans == the exhaustive every-window definition on the full
  *     q201 fixture;
  *   - the L threshold is sharp (39-char shared → nothing; 40 → span);
  *   - WinnowAnchors codegen == interpreted eval, and anchors are
  *     content-local (a shared 40-char substring yields a common anchor
  *     at every planted offset);
  *   - fixture edge semantics: exactly-L identical pair, adjacent spans
  *     merging vs separated spans staying split, unicode code-point
  *     spans, the license-twice doc, intra-doc-only repeats invisible;
  *   - strip/profile accounting agrees (stripped_chars == dup_chars,
  *     whole-doc dups strip to empty, clean docs keep their text md5);
  *   - the incremental merge rule: full recompute == untouched old rows
  *     ∪ mergeSpans(touched old rows ∪ dupSpansAgainst output), and the
  *     overlapping-batch probe fails loudly.
  */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fixtureDocs: DataFrame =
    spark.read.parquet(graft.queries.DedupQueries.SubstrFixture.ensure(spark))

  /** 60 chars, chosen to contain NO internal CDC boundary (window 8 /
    * div 64 defaults) — the premise is ASSERTED below, not assumed.
    */
  private val Span60 =
    "sixty character span planted at two different offsets here!!"

  test("planted 60-char span: CDC chunk tier misses it, substring tier finds it") {
    assert(Span60.length == 60)
    // flanks deliberately differ on BOTH sides (a shared flanking char
    // is verbatim-shared context and would correctly extend the span)
    val docs = df(
      1L -> ("alpha preamble words before." + Span60 + ",alpha coda after"),
      2L -> ("a completely different and much longer beta preamble:" +
        Span60 + "-beta tail"))
    // premise: the chunk tier structurally cannot see it — no whole
    // chunk is shared (the span holds no boundary, so each host's
    // enclosing chunk bleeds into doc-unique text)
    val chunks = ChunkDedup.crossDocChunks(
      ChunkDedup.cdcChunks(docs, "doc_id", "text"))
    assert(chunks.count() == 0L,
      "premise broken: pick a Span60 without an internal CDC boundary")
    // the substring tier reports exactly the span in both docs
    val spans = SubstrDedup.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    val off1 = docs.filter(col("doc_id") === 1L).head().getString(1).indexOf(Span60) + 1
    val off2 = docs.filter(col("doc_id") === 2L).head().getString(1).indexOf(Span60) + 1
    assert(spans.toSeq == Seq(
      (1L, off1.toLong, off1 + 59L, 60L),
      (2L, off2.toLong, off2 + 59L, 60L)))
  }

  test("two-pass anchor-pruned detection == exhaustive definition on the q201 fixture") {
    val twoPass = SubstrDedup.dupSpans(fixtureDocs).collect()
      .map(_.toSeq).toSet
    val exhaustive = SubstrDedup.dupSpansExhaustive(fixtureDocs).collect()
      .map(_.toSeq).toSet
    assert(twoPass == exhaustive)
    assert(twoPass.nonEmpty)
  }

  test("the L threshold is sharp: 39 shared chars invisible, 40 detected") {
    val s39 = "exactly thirty nine shared characters!!"
    assert(s39.length == 39)
    val s40 = s39 + "?"
    val under = SubstrDedup.dupSpans(df(
      1L -> ("unique left one " + s39 + " unique right one"),
      2L -> ("other left words " + s39 + " other right words")))
    // the flanking spaces are NOT shared context beyond the fragment:
    // both hosts flank with ' ', so the shared run is ' ' + s39 + ' ' =
    // 41 chars >= L — build the negative case with DIFFERING flanks
    val underStrict = SubstrDedup.dupSpans(df(
      1L -> ("uniqueleftone." + s39 + ".uniquerightone"),
      2L -> ("otherleftwords;" + s39 + ";otherrightwords")))
    assert(underStrict.count() == 0L)
    val over = SubstrDedup.dupSpans(df(
      1L -> ("uniqueleftone." + s40 + ".uniquerightone"),
      2L -> ("otherleftwords;" + s40 + ";otherrightwords")))
    assert(over.count() == 2L)
    assert(over.collect().forall(_.getLong(4) == 40L))
    // and the space-flanked "negative" is indeed the 41-char positive
    assert(under.collect().forall(_.getLong(4) == 41L))
  }

  test("WinnowAnchors: codegen result == interpreted eval, short docs empty") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("", "short", "a" * 39, Span60,
      fixtureDocs.orderBy(col("doc_id")).limit(3).collect().map(_.getString(1)).mkString(" "),
      "héllo wörld 中文字符串 straße 🎉 emoji span xx and some ascii tail words")
    val expr = graft.functions.WinnowAnchors(
      BoundReference(0, StringType, nullable = true), 20, 21, 31L, 1000000007L)
    val viaEval = texts.map(t =>
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(t)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq)
    import spark.implicits._
    val viaCodegen = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("i", "t")
      .select(col("i"), graft.functions.WinnowAnchors(col("t"), 20, 21).as("a"))
      .orderBy(col("i")).collect()
      .map(_.getSeq[Int](1).toSeq)
    assert(viaEval == viaCodegen.toSeq)
    assert(viaEval.head.isEmpty)         // empty doc
    assert(viaEval(1).isEmpty)           // < k chars
    assert(viaEval(2).isEmpty)           // 39 chars: no full window at t=40
    assert(viaEval(3).nonEmpty)          // 60 chars: at least one anchor
  }

  test("winnowing guarantee smoke: a shared 40-gram yields a common anchor at every offset") {
    import spark.implicits._
    val shared = "forty shared characters for the anchors!"
    assert(shared.length == 40)
    val hosts = (0 until 12).map { i =>
      val pad = (0 until 5 + i * 3).map(j => ('a' + (i * 7 + j * 5) % 26).toChar).mkString
      (i.toLong, pad + shared + pad.reverse + s"tail$i")
    }
    val anch = SubstrDedup.anchors(hosts.toDF("doc_id", "text"))
    val common = anch.groupBy($"anchor")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" === 12L)
    assert(common.count() >= 1L,
      "every host embeds the same 40-gram; the guarantee demands one anchor common to all")
  }

  test("fixture edges: exact-L pair, adjacent merge vs split, unicode, license twice, intra-doc invisible") {
    val spans = SubstrDedup.dupSpans(fixtureDocs)
      .filter(col("doc_id") >= 9000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // 9000 empty / 9001 short / 9011 intra-doc-only: no spans
    assert(!spans.contains(9000L) && !spans.contains(9001L) && !spans.contains(9011L))
    // 9002/9003: identical 40-char docs — one span covering everything
    assert(spans(9002L).map(s => (s._3, s._4, s._5)) == Seq((1L, 40L, 40L)))
    assert(spans(9003L).map(s => (s._3, s._4, s._5)) == Seq((1L, 40L, 40L)))
    // 9004/9005: whole-doc duplicates — one span covering the full text
    val len9004 = fixtureDocs.filter(col("doc_id") === 9004L).head().getString(1).length
    assert(spans(9004L).map(s => (s._3, s._4)) == Seq((1L, len9004.toLong)))
    assert(spans(9005L) == spans(9004L).map(s => s.copy(_1 = 9005L)))
    // 9006: the two 44-char spans sit adjacent — ONE merged 88-char span;
    // 9007: same spans 80+ chars apart — TWO 44-char spans
    assert(spans(9006L).map(_._5) == Seq(88L))
    assert(spans(9007L).map(_._5) == Seq(44L, 44L))
    // 9008/9009: the unicode span — exactly 40 CODE POINTS (multi-byte
    // and astral chars counted once); 9009 hosts it at position 1
    assert(spans(9008L).map(_._5) == Seq(40L))
    assert(spans(9009L).map(s => (s._3, s._5)) == Seq((1L, 40L)))
    // 9010: license twice, 20-char gap — two maximal spans, not one
    assert(spans(9010L).size == 2)
  }

  test("strip/profile accounting: stripped == dup mass, whole-doc dups strip empty, clean docs keep md5(text)") {
    import spark.implicits._
    val profile = SubstrDedup.dupProfile(fixtureDocs)
    val strip = SubstrDedup.stripSpans(fixtureDocs)
    val joined = profile.join(strip, Seq("doc_id"))
      .select($"doc_id", profile("total_chars"), $"dup_chars", profile("n_spans"),
        strip("total_chars").as("t2"), $"stripped_chars", strip("n_spans").as("n2"),
        $"kept_md5")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(4), s"total mismatch for doc ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(5), s"dup/stripped mismatch for doc ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(6), s"span count mismatch for doc ${r.getLong(0)}")
    }
    val byId = joined.map(r => r.getLong(0) -> r).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    assert(byId(9004L).getString(7) == emptyMd5 &&
      byId(9004L).getLong(2) == byId(9004L).getLong(1))
    // a clean doc keeps md5(text)
    val text9001 = fixtureDocs.filter($"doc_id" === 9001L).head().getString(1)
    val md59001 = java.security.MessageDigest.getInstance("MD5")
      .digest(text9001.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(9001L).getString(7) == md59001 && byId(9001L).getLong(2) == 0L)
    // fixture-wide conservation: every doc's stripped mass <= total
    joined.foreach(r => assert(r.getLong(5) <= r.getLong(1)))
  }

  test("mergeSpans == brute-force character-coverage islands on 200 random span sets") {
    import spark.implicits._
    // the incremental merge rule's core primitive, pinned against an
    // independent reference: interval union == islands of the covered
    // CHARACTER set (adjacency merges, overlap merges, disjoint stays)
    val rnd = new scala.util.Random(20260815L)
    val rows = (0 until 200).flatMap { doc =>
      (0 until 1 + rnd.nextInt(8)).map { i =>
        val st = 1 + rnd.nextInt(300)
        val en = st + rnd.nextInt(60)
        (doc.toLong, (i + 1).toLong, st.toLong, en.toLong, (en - st + 1).toLong)
      }
    }
    val merged = SubstrDedup.mergeSpans(
        rows.toDF("doc_id", "span_idx", "span_start", "span_end", "span_len"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    rows.groupBy(_._1).foreach { case (doc, sps) =>
      val covered = sps.flatMap(s => s._3 to s._4).toSet
      // islands of the covered set, in order
      val sorted = covered.toSeq.sorted
      val islands = sorted.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc :+ ((a, b)), c) if c == b + 1 => acc :+ ((a, c))
        case (acc, c) => acc :+ ((c, c))
      }
      val expected = islands.zipWithIndex.map { case ((a, b), i) =>
        (doc, (i + 1).toLong, a, b, b - a + 1)
      }
      assert(merged(doc) == expected,
        s"doc $doc: ${merged(doc)} != $expected (input ${sps.sortBy(_._3)})")
    }
  }

  test("contamination spans: exactly the license-carrying train docs flag against the 9010 benchmark doc") {
    import spark.implicits._
    val fx = fixtureDocs
    val train = fx.filter($"doc_id" < 1000L)
    val bench = fx.filter($"doc_id" >= 9000L)
    val spans = SubstrDedup.contaminationSpans(train, bench).collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    // the only cross-set verbatim material is the license (bench doc
    // 9010 carries it twice); every i%10==0 train doc holds one copy
    val expectedDocs = (0 until 1000).filter(_ % 10 == 0).map(_.toLong).toSet
    assert(spans.map(_._1).toSet == expectedDocs,
      s"contaminated set: got ${spans.length} spans over ${spans.map(_._1).distinct.length} docs")
    assert(spans.forall(_._2 >= 100L),
      "every contamination span must cover at least the license body")
    // one span per contaminated doc (the license occurs once per host)
    assert(spans.map(_._1).distinct.length == spans.length)
    // symmetry sanity: the benchmark side as train against the main
    // docs flags 9010 and nothing else
    val reverse = SubstrDedup.contaminationSpans(bench, train).collect()
      .map(_.getLong(0)).toSet
    assert(reverse == Set(9010L), s"reverse contamination: $reverse")
  }

  test("bucketed anchor state: the corpus side of the touched-detection semi-join never moves") {
    import spark.implicits._
    // the anchors scaladoc claim ("store it partitioned by anchor so
    // dupSpansAgainst's semi-join prunes at the source") made
    // executable — the ChunkDedupSpec bucketed-state pin applied to the
    // substring tier: a lake that stores the anchor state bucketed by
    // `anchor` serves every incremental batch's touched-detection with
    // ZERO exchange on the corpus-scale side; only the batch-scaled
    // probe side moves
    val oldDocs = fixtureDocs.filter(col("doc_id") < 500L)
    spark.sql("CREATE DATABASE IF NOT EXISTS ss_bkt")
    spark.sql("DROP TABLE IF EXISTS ss_bkt.anchors")
    val loc = new java.io.File("spark-warehouse/ss_bkt.db/anchors")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    SubstrDedup.anchors(oldDocs)
      .repartition(8, $"anchor")
      .write.bucketBy(8, "anchor").saveAsTable("ss_bkt.anchors")
    val newDocs = fixtureDocs.filter(col("doc_id") >= 500L && col("doc_id") < 560L)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // force the co-located path (the lake-scale regime: a big crawl
      // batch's anchor set does not broadcast), pin off the two
      // small-scale heuristics (see ChunkDedupSpec / NOTES r13 §6), and
      // match parallelism to the bucket count — the lake-scale sizing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // the EXACT touched-detection join dupSpansAgainst issues
      val na = SubstrDedup.anchors(newDocs)
      val touched = spark.table("ss_bkt.anchors")
        .join(na.select($"anchor").distinct(), Seq("anchor"), "left_semi")
        .select($"doc_id").distinct()
      val rows = touched.as[Long].collect().toSet
      val plan = touched.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val joinIdx = plan.indexOf("Join")
      assert(joinIdx >= 0, plan.take(800))
      val joinSection = plan.substring(joinIdx)
      assert(joinSection.contains("ss_bkt"),
        s"semi-join must read the bucketed state:\n$joinSection")
      val beforeScan = joinSection.substring(0, joinSection.indexOf("ss_bkt"))
      assert(!beforeScan.contains("Exchange"),
        s"corpus-side bucketed scan must not be exchanged:\n$joinSection")
      assert("Exchange".r.findAllIn(joinSection).size <= 1,
        s"only the batch-side probe may move:\n$joinSection")
      // the state actually detects: license docs < 500 share anchors
      // with license docs in [500, 560)
      assert(rows.nonEmpty, "expected touched old docs via the shared license")
      assert(rows.forall(_ < 500L))
      // and the operator run FROM the bucketed lake state == from the
      // in-memory frame (the lake path changes layout, never answers)
      val viaLake = SubstrDedup.dupSpansAgainst(newDocs, oldDocs,
        spark.table("ss_bkt.anchors")).collect().map(_.toSeq).toSet
      val viaFrame = SubstrDedup.dupSpansAgainst(newDocs, oldDocs,
        SubstrDedup.anchors(oldDocs)).collect().map(_.toSeq).toSet
      assert(viaLake == viaFrame && viaLake.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("incremental decontamination: two benchmark waves reconstruct the from-scratch answer; overlapping spans union; re-processing is idempotent") {
    import spark.implicits._
    val fx = fixtureDocs
    val train = fx.filter($"doc_id" < 1000L)
    val trainAnchors = SubstrDedup.anchors(train)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // recover the license text from the license-twice benchmark doc so
    // the waves can carry OVERLAPPING license fragments (each >= L)
    val t9010 = fx.filter($"doc_id" === 9010L).head().getString(1)
    val lic = t9010.substring(0, t9010.indexOf(" unique middle bits "))
    assert(lic.length >= 100)
    // wave 1: the license's first 60 chars; wave 2: chars 40..end plus
    // the no-contamination edge docs — a train doc's span GROWS across
    // waves ([o, o+59] ∪ [o+40, o+len-1] must union to the full span)
    val bench1 = df(9100L -> ("aaa " + lic.substring(0, 60) + " zzz"))
    val bench2 = df(9101L -> ("qqq " + lic.substring(40) + " www"))
      .unionByName(fx.filter($"doc_id" >= 9000L && $"doc_id" <= 9005L))
    val cols = Seq("doc_id", "span_idx", "span_start", "span_end", "span_len")
    // single wave from empty state == from-scratch
    val stored1 = SubstrDedup.contaminationSpansAgainst(bench1, train, trainAnchors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scratch1 = SubstrDedup.contaminationSpans(train, bench1)
    assert(stored1.collect().map(_.toSeq).toSet == scratch1.collect().map(_.toSeq).toSet)
    assert(stored1.count() > 0L)
    // wave 2 merges into the stored manifest: untouched stored rows ∪
    // interval union for touched docs
    val against2 = SubstrDedup.contaminationSpansAgainst(bench2, train, trainAnchors)
    val touched2 = trainAnchors
      .join(SubstrDedup.anchors(bench2).select($"anchor").distinct(),
        Seq("anchor"), "left_semi")
      .select($"doc_id").distinct()
    val reconstructed = stored1.join(touched2, Seq("doc_id"), "left_anti")
      .select(cols.map(col): _*)
      .unionByName(SubstrDedup.mergeSpans(
        stored1.join(touched2, Seq("doc_id"), "left_semi")
          .select(cols.map(col): _*)
          .unionByName(against2)))
      .collect().map(_.toSeq).toSet
    val full = SubstrDedup.contaminationSpans(train, bench1.unionByName(bench2))
      .collect().map(r => cols.map(c => r.getAs[Any](c))).toSet
    assert(reconstructed == full)
    // the merged spans are the FULL license span per carrier — the
    // overlapping fragments really unioned (neither wave alone covers it)
    val carriers = (0 until 1000).filter(_ % 10 == 0).map(_.toLong).toSet
    val byDoc = full.map(s => (s.head.asInstanceOf[Long], s(4).asInstanceOf[Long]))
    assert(byDoc.map(_._1) == carriers)
    // >= the license: the overlapping fragments really unioned (neither
    // wave alone covers it: wave 1 yields <= 62, wave 2 <= len - 38).
    // <= len + 2: the flanking spaces the fixture plants around the
    // license are themselves verbatim-shared context when the bench
    // fragment's flank matches (e.g. the space before a suffix-planted
    // license aligning with bench1's "aaa " space) and correctly extend
    // the span by at most one char per side
    assert(byDoc.forall(d => d._2 >= lic.length.toLong && d._2 <= lic.length + 2L),
      s"expected full-license spans of ~${lic.length}: ${byDoc.take(5)}")
    val w1Lens = stored1.collect().map(_.getAs[Long]("span_len"))
    assert(w1Lens.nonEmpty && w1Lens.forall(l => l >= 60L && l <= 62L))
    // idempotence: re-processing wave 2 against the complete manifest
    // changes nothing (the no-probe contract's justification)
    val fullDf = SubstrDedup.contaminationSpans(train, bench1.unionByName(bench2))
    val re = SubstrDedup.mergeSpans(fullDf.unionByName(against2))
      .collect().map(_.toSeq).toSet
    assert(re == full)
    stored1.unpersist()
    trainAnchors.unpersist()
  }

  test("incremental merge rule: full == untouched old ∪ mergeSpans(touched old ∪ against); overlap probe throws") {
    import spark.implicits._
    val all = fixtureDocs
    val oldDocs = all.filter($"doc_id" < 500L || $"doc_id".isin(9002L, 9004L, 9006L, 9010L))
    val newDocs = all.exceptAll(oldDocs)
    val oldAnchors = SubstrDedup.anchors(oldDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val against = SubstrDedup.dupSpansAgainst(newDocs, oldDocs, oldAnchors)
    val oldSpans = SubstrDedup.dupSpans(oldDocs)
    val touched = oldAnchors
      .join(SubstrDedup.anchors(newDocs).select($"anchor").distinct(),
        Seq("anchor"), "left_semi")
      .select($"doc_id").distinct()
    val untouchedOldRows = oldSpans.join(touched, Seq("doc_id"), "left_anti")
    val mergedRows = SubstrDedup.mergeSpans(
      oldSpans.join(touched, Seq("doc_id"), "left_semi")
        .select("doc_id", "span_idx", "span_start", "span_end", "span_len")
        .unionByName(against))
    val reconstructed = untouchedOldRows
      .select("doc_id", "span_idx", "span_start", "span_end", "span_len")
      .unionByName(mergedRows)
      .collect().map(_.toSeq).toSet
    val full = SubstrDedup.dupSpans(all).collect().map(_.toSeq).toSet
    assert(reconstructed == full)
    // the overlap probe fails loudly
    val ex = intercept[IllegalArgumentException] {
      SubstrDedup.dupSpansAgainst(oldDocs.limit(3), oldDocs, oldAnchors).collect()
    }
    assert(ex.getMessage.contains("disjoint"))
    oldAnchors.unpersist()
  }

  test("normalize flag on the incremental/decontamination legs: NFD spans invisible raw, found flagged, parity with the batch leg") {
    import spark.implicits._
    // the NfcSpec license construction: an accent in EVERY word, so no
    // accent-free stretch >= L is byte-identical across encodings
    val lic = java.text.Normalizer.normalize(
      (0 until 12).map(i => s"shar\u00E9d$i lic\u00EAnce$i").mkString(" "),
      java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(lic, java.text.Normalizer.Form.NFD)
    assert(nfd != lic && lic.length >= 100)
    val oldDocs = df(
      1L -> ("unique head one." + lic + ",unique tail one"),
      5L -> "wholly unrelated prior text sharing nothing with anything")
    val newDocs = df(10L -> ("another head ten;" + nfd + ":another tail ten"))
    val stateRaw = SubstrDedup.anchors(oldDocs)
    val stateNorm = SubstrDedup.anchors(oldDocs, normalize = true)
    // raw state + raw probe: byte-distinct at every window -> nothing
    assert(SubstrDedup.dupSpansAgainst(newDocs, oldDocs, stateRaw).count() == 0L)
    // flagged state + flagged probe == the flagged BATCH leg (doc 1 is
    // touched and doc 10 is the batch, so the incremental output covers
    // every duplicated doc), spans in normalized coordinates
    val viaInc = SubstrDedup
      .dupSpansAgainst(newDocs, oldDocs, stateNorm, normalize = true)
      .collect().map(_.toSeq).toSet
    val viaBatch = SubstrDedup
      .dupSpans(oldDocs.unionByName(newDocs), normalize = true)
      .collect().map(_.toSeq).toSet
    assert(viaInc == viaBatch && viaInc.nonEmpty,
      s"incremental ${viaInc.size} vs batch ${viaBatch.size}")
    assert(viaInc.map(_.head).map(_.asInstanceOf[Long]) == Set(1L, 10L))
    // decontamination twins: batch-vs-batch and batch-vs-state agree
    // under the flag; both see nothing raw
    assert(SubstrDedup.contaminationSpans(oldDocs, newDocs).count() == 0L)
    assert(SubstrDedup
      .contaminationSpansAgainst(newDocs, oldDocs, stateRaw).count() == 0L)
    val decontam = SubstrDedup
      .contaminationSpans(oldDocs, newDocs, normalize = true)
      .collect().map(_.toSeq).toSet
    val decontamInc = SubstrDedup
      .contaminationSpansAgainst(newDocs, oldDocs, stateNorm, normalize = true)
      .collect().map(_.toSeq).toSet
    assert(decontam == decontamInc && decontam.nonEmpty)
    // contamination reports TRAIN-side spans only: doc 1's leaked license
    assert(decontam.map(_.head) == Set(1L))
  }

  test("anchor-state guards fail loudly: normalization mismatch both ways, legacy md5-string format, missing norm record") {
    import spark.implicits._
    val oldDocs = df(1L -> ("x" * 80), 2L -> ("y" * 80))
    val newDocs = df(10L -> ("z" * 80))
    val stateRaw = SubstrDedup.anchors(oldDocs)
    val stateNorm = SubstrDedup.anchors(oldDocs, normalize = true)
    // a normalized state probed raw (and vice versa) must fail BEFORE
    // any join can silently return empty — the coordinate-space contract
    val e1 = intercept[IllegalArgumentException] {
      SubstrDedup.dupSpansAgainst(newDocs, oldDocs, stateNorm)
    }
    assert(e1.getMessage.contains("normalize=true") &&
      e1.getMessage.contains("normalize=false"))
    val e2 = intercept[IllegalArgumentException] {
      SubstrDedup.contaminationSpansAgainst(newDocs, oldDocs, stateRaw,
        normalize = true)
    }
    assert(e2.getMessage.contains("normalize"))
    // the pre-xxhash64 md5-hex state: string-vs-bigint join keys coerce
    // to null and miss everything — the dtype guard names the migration
    val legacy = stateRaw.select($"doc_id", $"pos",
      md5($"anchor".cast("string")).as("anchor"), $"norm")
    val e3 = intercept[IllegalArgumentException] {
      SubstrDedup.dupSpansAgainst(newDocs, oldDocs, legacy)
    }
    assert(e3.getMessage.contains("STRING") && e3.getMessage.contains("Rebuild"))
    // a state predating the normalization record
    val noNorm = stateRaw.drop("norm")
    val e4 = intercept[IllegalArgumentException] {
      SubstrDedup.contaminationSpansAgainst(newDocs, oldDocs, noNorm)
    }
    assert(e4.getMessage.contains("norm"))
    // an EMPTY state carries no recorded bit to contradict — the probe
    // proceeds (nothing to miss) instead of failing on a vacuous state
    assert(SubstrDedup.dupSpansAgainst(newDocs, oldDocs,
      stateRaw.limit(0)).count() == 0L)
  }
}
