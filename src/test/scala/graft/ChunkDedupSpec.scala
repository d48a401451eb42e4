package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChunkDedup

/** Pins the CDC chunk-dedup operator family:
  *   - cdcChunks is LOSSLESS (concat of chunks in idx order == text,
  *     contiguous 0-based idx) on real documents AND the edge fixture
  *     (empty doc, sub-window doc, doc ending exactly on a boundary);
  *   - crossDocChunks detects a planted paragraph shared by three docs
  *     at three DIFFERENT character offsets — the shift-robustness that
  *     is CDC's whole point — while fixed-width framing at the same
  *     granularity finds nothing on the same data;
  *   - duplicatedMass profiles every chunked doc (zero rows kept) and
  *     charges exactly the shared chunks' characters.
  */
class ChunkDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** ~900 chars of deterministic word soup — long enough to carry
    * a dozen expected CDC boundaries (div=64).
    */
  private val para: String =
    (0 until 160).map(i => s"w${i * 7 % 101}x${i % 13}").mkString(" ")

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, para),                                        // bare
      (2L, ("pfx shifted by a short pad " + para)),      // shifted right
      (3L, ("a much longer and entirely different preamble sits here " +
        para + " plus a trailing coda after the shared text")),
      (4L, "totally unrelated content qq rr ss tt uu vv ww"),
      (5L, ""),                                          // empty: no rows
      (6L, "short")                                      // sub-window
    ).toDF("doc_id", "text")
  }

  test("cdcChunks is lossless: concat in idx order == text, contiguous idx") {
    import spark.implicits._
    // fixture ids shifted out of the real table's id space
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .unionByName(fixture.withColumn("doc_id", $"doc_id" + 1000000L))
    val chunks = ChunkDedup.cdcChunks(docs, "doc_id", "text")
    val rebuilt = chunks
      .groupBy($"doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"chunk_idx", $"chunk"))),
          x => x.getField("chunk")), "").as("rebuilt"),
        min($"chunk_idx").as("lo"),
        max($"chunk_idx").as("hi"),
        count(lit(1)).as("n"))
    val joined = docs.join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id", $"text", $"rebuilt", $"lo", $"hi", $"n").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val text = r.getString(1)
      if (text.isEmpty) assert(r.isNullAt(2), s"empty doc ${r.getLong(0)} must chunk to no rows")
      else {
        assert(r.getString(2) == text, s"doc ${r.getLong(0)} not rebuilt losslessly")
        assert(r.getLong(3) == 0L && r.getLong(4) == r.getLong(5) - 1,
          s"doc ${r.getLong(0)} chunk_idx not contiguous from 0")
      }
    }
  }

  test("cdcChunks never emits an empty chunk (boundary-at-end tail dropped)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val chunks = ChunkDedup.cdcChunks(docs, "doc_id", "text")
    assert(chunks.filter(length($"chunk") === 0).count() == 0L)
  }

  test("crossDocChunks finds the planted paragraph at three different offsets") {
    import spark.implicits._
    val chunks = ChunkDedup.cdcChunks(fixture, "doc_id", "text")
    val clusters = ChunkDedup.crossDocChunks(chunks).collect()
    assert(clusters.nonEmpty, "no cross-doc chunk clusters found")
    val allThree = clusters.filter(r => r.getAs[String]("docs") == "1,2,3")
    assert(allThree.nonEmpty,
      "no chunk shared by all three hosts despite the common paragraph")
    // the shared interior chunks carry real mass, not one lucky fragment
    assert(allThree.map(_.getAs[Long]("chunk_len")).sum >= 100L,
      "shared chunks total < 100 chars; CDC alignment failed")
    // doc 4 (unrelated) never appears in any cluster
    assert(!clusters.exists(_.getAs[String]("docs").split(",").contains("4")))
  }

  test("fixed-width framing finds NOTHING on the same shifted data (the CDC contrast)") {
    import spark.implicits._
    // Same granularity (64-char frames), same minLen, same detection;
    // but frame starts are character offsets, and the three hosts carry
    // prefixes of different (non-multiple-of-64) lengths, so every
    // frame of the shared paragraph misaligns.
    val fixed = fixture
      .filter($"doc_id".isin(1L, 2L, 3L))
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, cast(floor((length(text)-1)/64) as int))," +
          " i -> substring(text, i*64+1, 64))")).as(Seq("chunk_idx", "chunk")))
      .filter(length($"chunk") >= 16)
    val clusters = ChunkDedup.crossDocChunks(fixed)
    assert(clusters.count() == 0L,
      "fixed-width frames aligned across shifted copies; fixture no longer shifts")
  }

  test("minChunkLen filters sub-threshold chunks from clusters") {
    import spark.implicits._
    val chunks = ChunkDedup.cdcChunks(fixture, "doc_id", "text")
    val big = ChunkDedup.crossDocChunks(chunks, minChunkLen = 10000)
    assert(big.count() == 0L)
  }

  test("stripShared: owner docs untouched, later hosts lose exactly the shared mass") {
    import spark.implicits._
    val chunks = ChunkDedup.cdcChunks(fixture, "doc_id", "text").cache()
    val out = ChunkDedup.stripShared(chunks).collect()
      .map(r => r.getLong(0) -> r).toMap

    // independent reimplementation of the keep rule on plain Scala
    // collections: owner = min doc over identical chunk content
    val collected = chunks
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"chunk")
      .as[(Long, Long, String)].collect()
    val owner: Map[String, Long] = collected
      .filter(_._3.length >= 16)
      .groupBy(_._3).map { case (c, occ) => c -> occ.map(_._1).min }
    val expectedKept: Map[Long, String] = collected.groupBy(_._1).map {
      case (d, occ) =>
        d -> occ.sortBy(_._2).map { case (_, _, c) =>
          if (c.length >= 16 && owner(c) < d) "" else c
        }.mkString
    }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    assert(out.keySet == expectedKept.keySet)
    expectedKept.foreach { case (d, kept) =>
      val r = out(d)
      assert(r.getAs[String]("kept_md5") == md5hex(kept), s"doc $d kept text diverges")
      assert(r.getAs[Long]("total_chars") - r.getAs[Long]("stripped_chars") == kept.length.toLong,
        s"doc $d stripped-mass accounting diverges")
    }
    // structure: doc 1 owns the paragraph — fully intact; docs 2/3 lose
    // real mass; doc 4 (unrelated) intact
    assert(out(1L).getAs[Long]("stripped_chars") == 0L)
    assert(out(1L).getAs[String]("kept_md5") == md5hex(para))
    Seq(2L, 3L).foreach(d => assert(out(d).getAs[Long]("stripped_chars") >= 100L, s"doc $d"))
    assert(out(4L).getAs[Long]("n_stripped_chunks") == 0L)
    chunks.unpersist()
  }

  test("stripShared: an exact whole-doc duplicate is stripped to (at most) its short chunks") {
    import spark.implicits._
    val docs = fixture.unionByName(Seq((9L, para)).toDF("doc_id", "text"))
    val out = ChunkDedup.stripShared(ChunkDedup.cdcChunks(docs, "doc_id", "text"))
      .filter($"doc_id" === 9L).collect().head
    // every >=16-char chunk of doc 9 is owned by doc 1 (identical text);
    // what survives is only sub-threshold fragments
    val shortMass = ChunkDedup.cdcChunks(fixture.filter($"doc_id" === 1L), "doc_id", "text")
      .filter(length($"chunk") < 16)
      .agg(coalesce(sum(length($"chunk")), lit(0)).cast("long")).as[Long].collect().head
    assert(out.getAs[Long]("total_chars") - out.getAs[Long]("stripped_chars") == shortMass)
  }

  test("crossDocChunksAgainst: old manifest for untouched hashes + incremental rows == full recompute") {
    import spark.implicits._
    // real docs + the planted fixture, split by parity so shared chunks
    // cross the old/new boundary in both directions
    val all = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .unionByName(fixture.withColumn("doc_id", $"doc_id" + 1000000L))
    val oldDocs = all.filter($"doc_id" % 2 === 0)
    val newDocs = all.filter($"doc_id" % 2 === 1)

    val oldChunks = ChunkDedup.cdcChunks(oldDocs, "doc_id", "text")
    val newChunks = ChunkDedup.cdcChunks(newDocs, "doc_id", "text")
    val state = ChunkDedup.chunkPairState(oldChunks).cache()

    val incremental = ChunkDedup.crossDocChunksAgainst(newChunks, state)
    val touched = ChunkDedup.chunkPairState(newChunks).select($"chunk_hash").distinct()
    val merged = ChunkDedup.crossDocChunks(oldChunks)
      .join(touched, Seq("chunk_hash"), "left_anti")
      .unionByName(incremental)

    val full = ChunkDedup.crossDocChunks(ChunkDedup.cdcChunks(all, "doc_id", "text"))
    assert(merged.count() > 0)
    assert(merged.exceptAll(full).count() == 0L && full.exceptAll(merged).count() == 0L,
      "incremental manifest merge diverges from the full recompute")
    // the incremental rows really cross the boundary: the planted
    // paragraph's hosts (1000001..1000003) split 1/2 across parities
    assert(incremental.filter($"docs".contains("1000001") && $"docs".contains("1000002")).count() > 0)
    state.unpersist()
  }

  test("crossDocChunksAgainst refuses an overlapping batch loudly") {
    val chunks = ChunkDedup.cdcChunks(fixture, "doc_id", "text")
    val state = ChunkDedup.chunkPairState(chunks)
    val e = intercept[IllegalArgumentException] {
      ChunkDedup.crossDocChunksAgainst(chunks, state)
    }
    assert(e.getMessage.contains("disjoint doc sets"))
  }

  test("crossDocChunksAgainst refuses a build-config mismatch loudly (mismatched boundaries silently miss everything otherwise)") {
    import org.apache.spark.sql.functions.col
    val oldChunks = ChunkDedup.cdcChunks(
      fixture.filter(col("doc_id") <= 2), "doc_id", "text")
    val state = ChunkDedup.chunkPairState(oldChunks)
    val newDocs = fixture.filter(col("doc_id") >= 3)
    // another divisor -> different expected chunk size -> disjoint hashes
    val e1 = intercept[IllegalArgumentException] {
      ChunkDedup.crossDocChunksAgainst(
        ChunkDedup.cdcChunks(newDocs, "doc_id", "text", div = 32L), state)
    }
    assert(e1.getMessage.contains("div=32") && e1.getMessage.contains("div=64"),
      e1.getMessage)
    // same chunker, another minChunkLen -> different state population
    val e2 = intercept[IllegalArgumentException] {
      ChunkDedup.crossDocChunksAgainst(
        ChunkDedup.cdcChunks(newDocs, "doc_id", "text"), state, minChunkLen = 32)
    }
    assert(e2.getMessage.contains("min=32") && e2.getMessage.contains("min=16"))
    // a state predating the record is named as such
    assert(intercept[IllegalArgumentException] {
      ChunkDedup.crossDocChunksAgainst(
        ChunkDedup.cdcChunks(newDocs, "doc_id", "text"), state.drop("cfg"))
    }.getMessage.contains("records no"))
    // matching configs still run (the guard is not over-broad)
    assert(ChunkDedup.crossDocChunksAgainst(
      ChunkDedup.cdcChunks(newDocs, "doc_id", "text"), state).count() >= 0L)
  }

  test("bucketed chunk-pair state: the corpus side of the incremental semi-join never moves") {
    import spark.implicits._
    // the chunkPairState scaladoc claim ("partition the stored table by
    // chunk_hash so crossDocChunksAgainst's semi-join prunes at the
    // source") made executable — the RangeJoin/AsOfJoin zero-movement
    // pin applied to the chunk tier: a lake that stores the pair state
    // bucketed by chunk_hash serves every incremental batch with ZERO
    // exchange on the corpus-scale side; only the batch-scaled probe
    // side moves
    spark.sql("CREATE DATABASE IF NOT EXISTS ck_bkt")
    spark.sql("DROP TABLE IF EXISTS ck_bkt.state")
    val loc = new java.io.File("spark-warehouse/ck_bkt.db/state")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    ChunkDedup.chunkPairState(ChunkDedup.cdcChunks(fixture, "doc_id", "text"))
      .repartition(8, $"chunk_hash")
      .write.bucketBy(8, "chunk_hash").saveAsTable("ck_bkt.state")
    // a disjoint new batch that shares the paragraph with the old corpus
    val newDocs = Seq(
      (100L, "an entirely new framing around the shared body " + para),
      (101L, "fresh unrelated words aa bb cc dd")).toDF("doc_id", "text")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // adaptive.autoBroadcastJoinThreshold is createOptional and unset by
    // GraftSession — capture as Option and UNSET on restore, or the
    // "restore" would pin -1 and silently disable AQE broadcast
    // conversion for every later suite in the shared session
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val got = try {
      // force the co-located path: at lake scale the touched-hash set of
      // a big crawl batch does not broadcast — this is the regime the
      // bucketed layout exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // at TEST scale (8 buckets < 32 shuffle partitions) the
      // DisableUnnecessaryBucketedScan heuristic trades the bucket
      // layout away for parallelism, and EnsureRequirements re-shuffles
      // an 8-bucket side to meet a 32-partition default; at lake scale
      // the bucket count is SIZED TO THE CLUSTER so neither fires — pin
      // the layout's zero-movement property under matched parallelism,
      // not the small-scale heuristics' calls
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val out = ChunkDedup.crossDocChunksAgainst(
        ChunkDedup.cdcChunks(newDocs, "doc_id", "text"), spark.table("ck_bkt.state"))
      val rows = out.collect() // finalize AQE: audit the executed plan
      val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // the semi-join subtree prints LAST (union children: newState then
      // relevantOld); between the join node and the bucketed scan there
      // must be NO exchange, and the subtree's only exchange is the
      // batch-side probe
      val joinIdx = plan.lastIndexOf("Join")
      assert(joinIdx >= 0, plan.take(800))
      val joinSection = plan.substring(joinIdx)
      assert(joinSection.contains("ck_bkt"), s"semi-join must read the bucketed state:\n$joinSection")
      val beforeScan = joinSection.substring(0, joinSection.indexOf("ck_bkt"))
      assert(!beforeScan.contains("Exchange"),
        s"corpus-side bucketed scan must not be exchanged:\n$joinSection")
      assert("Exchange".r.findAllIn(joinSection).size <= 1,
        s"only the batch-side probe may move:\n$joinSection")
      rows.map(r => (r.getString(0), r.getLong(1))).toMap
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // and the merge rule still holds: updated rows == full recompute,
    // restricted to the hashes the new batch touched
    val full = ChunkDedup.crossDocChunks(
      ChunkDedup.cdcChunks(fixture.unionByName(newDocs), "doc_id", "text"))
    val touched = ChunkDedup.chunkPairState(ChunkDedup.cdcChunks(newDocs, "doc_id", "text"))
      .select($"chunk_hash").distinct().as[String].collect().toSet
    val expected = full.collect()
      .filter(r => touched(r.getString(0)))
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.nonEmpty && got == expected,
      s"incremental clusters diverge from recompute: got=${got.size} want=${expected.size}")
  }

  test("duplicatedMass covers every chunked doc and charges exactly the shared chunks") {
    import spark.implicits._
    val chunks = ChunkDedup.cdcChunks(fixture, "doc_id", "text").cache()
    val mass = ChunkDedup.duplicatedMass(chunks).collect()
      .map(r => r.getLong(0) -> r).toMap
    // every doc with >=1 chunk has a row (even all-short docs); the
    // empty doc (zero chunks) has none
    val chunked = chunks.select($"doc_id").distinct().as[Long].collect().toSet
    assert(mass.keySet == chunked)
    assert(!mass.contains(5L))
    // doc 6 ("short", one sub-floor chunk): kept as a zero-share row
    // with its full mass counted, not silently dropped
    assert(mass(6L).getAs[Long]("n_shared_chunks") == 0L &&
      mass(6L).getAs[Long]("total_chars") == 5L &&
      mass(6L).getAs[Long]("n_chunks") == 1L)
    // totals agree with stripShared's accounting for EVERY doc
    val stripTotals = ChunkDedup.stripShared(chunks)
      .select($"doc_id", $"total_chars").as[(Long, Long)].collect().toMap
    mass.foreach { case (d, r) =>
      assert(r.getAs[Long]("total_chars") == stripTotals(d),
        s"doc $d: q188 total ${r.getAs[Long]("total_chars")} != q189 total ${stripTotals(d)}")
    }
    // doc 4: fully distinct, zero shared
    assert(mass(4L).getAs[Long]("n_shared_chunks") == 0L)
    assert(mass(4L).getAs[Long]("shared_chars") == 0L)
    // hosts 1-3: shared mass strictly positive and <= total
    Seq(1L, 2L, 3L).foreach { d =>
      val r = mass(d)
      assert(r.getAs[Long]("shared_chars") > 0L, s"doc $d shows no shared mass")
      assert(r.getAs[Long]("shared_chars") <= r.getAs[Long]("total_chars"))
      assert(r.getAs[Long]("n_shared_chunks") <= r.getAs[Long]("n_chunks"))
    }
    // cross-check: per-doc shared chunk count equals a direct recount
    val direct = {
      val hashed = chunks.filter(length($"chunk") >= 16)
        .select($"doc_id", md5($"chunk".cast("binary")).as("h"))
      val nd = hashed.groupBy($"h").agg(countDistinct($"doc_id").as("nd"))
      hashed.join(nd, "h").filter($"nd" >= 2)
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    }
    mass.foreach { case (d, r) =>
      assert(r.getAs[Long]("n_shared_chunks") == direct.getOrElse(d, 0L), s"doc $d recount")
    }
    chunks.unpersist()
  }
}
