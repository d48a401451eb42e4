package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg over the file source matches the batch computation") {
    import spark.implicits._
    // FileStreamSource needs a directory/glob, not a bare file path
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    assert(stream.isStreaming)
    val q = EventStream.hourlyAgg(stream)
      .writeStream.outputMode("append").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; with one batch the
      // final watermark closes all but the trailing 2h. Compare those rows
      // against the batch plan.
      val got = spark.table("hourly")
        .select($"hour", $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Tables.events(spark, sf)
        .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,6)")).cast("double").as("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got.nonEmpty)
      assert(got.subsetOf(batch))
    } finally q.stop()
  }

  test("streaming hourly agg (exact distinct, complete mode) EQUALS the q16 batch result") {
    import spark.implicits._
    // sf0.01, not the suite default: q16's HAVING n >= 5 filters sf0.001
    // to zero groups (max hourly group there is 3 events) — parity over an
    // empty set would pin nothing
    val sf = "/root/testdata/sf0.01"
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    val q = EventStream.hourlyAggExact(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_exact").start()
    try {
      q.processAllAvailable()
      // same HAVING n >= 5 as q16; complete mode emits every window, so
      // this is full equality, not the append-mode subset check above
      val got = spark.table("hourly_exact")
        .filter($"n" >= 5)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
      val batch = SparkEntry.queries("q16_events_hourly")(spark, sf)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
      assert(got.nonEmpty)
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-stream interval join: click->purchase attribution equals the batch join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    val q = EventStream.attributionJoin(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("attrib").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = Tables.events(spark, sf)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("cid"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id".as("pid"))
      val batch = purchases.join(clicks,
          $"pu" === $"cu" && $"cts" <= $"pts" &&
            $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES"))
        .select($"pid", $"cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty, "expected some attributed purchases at sf0.01")
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming hopping-window agg (complete mode) EQUALS the batch q108 result") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    val q = EventStream.hoppingAgg(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hopping").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hopping").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = SparkEntry.queries("q108_hopping_windows")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.nonEmpty)
      assert(got == batch, "streaming hopping windows must equal the batch plan exactly")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join; outer keeps unmatched stream rows") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    // static dimension: a tier for 2/3 of users (pure function of the id,
    // so the batch oracle is exact); held-out third exercises the outer path
    val dim = Tables.events(spark, sf).select($"user_id").distinct()
      .filter($"user_id" % 3 =!= 0)
      .withColumn("tier", concat(lit("t"), ($"user_id" % 3).cast("string")))
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    val q = EventStream.enrichWithDim(stream, dim, "left_outer")
      .select($"event_id", $"user_id", $"tier")
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      val batch = Tables.events(spark, sf)
        .join(dim, Seq("user_id"), "left_outer")
        .select($"event_id", $"user_id", $"tier").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(got.nonEmpty)
      assert(got.exists(_._3.isEmpty), "expected unmatched stream rows to survive the outer join")
      assert(got.exists(_._3.nonEmpty), "expected some enriched rows")
      assert(got == batch)
    } finally q.stop()
  }

  test("stream-stream LEFT SEMI join: attributed purchases emit once each, equal to the batch semi-join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val stream = EventStream.readEvents(spark, s"$sf/events*.parquet")
    val q = EventStream.attributionSemi(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("attrib_semi").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib_semi").select($"purchase_id").collect()
        .map(_.getLong(0)).toSeq
      // once each: no per-click fan-out in the output
      assert(got.size == got.toSet.size,
        "semi join emitted a purchase more than once")
      val ev = Tables.events(spark, sf)
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("cts"))
      val batch = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id".as("pid"))
        .join(clicks,
          $"pu" === $"cu" && $"cts" <= $"pts" &&
            $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES"),
          "left_semi")
        .select($"pid").collect().map(_.getLong(0)).toSet
      assert(got.nonEmpty, "expected some attributed purchases at sf0.01")
      assert(got.toSet == batch)
    } finally q.stop()
  }

  test("checkpoint recovery: a restarted query does not reprocess committed input") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val src = s"$sf/events*.parquet"
    def run(name: String): Long = {
      val q = EventStream.readEvents(spark, src)
        .groupBy($"event_type").count()
        .writeStream.outputMode("complete").format("memory")
        .option("checkpointLocation", ckpt)
        .queryName(name).start()
      try { q.processAllAvailable(); spark.table(name).count() } finally q.stop()
    }
    assert(run("ckpt_first") > 0, "first run must process the static input")
    // same checkpoint, same (exhausted) source: the restart must recover
    // offsets and emit NO new state — exactly-once over the file source
    assert(run("ckpt_second") == 0,
      "restart from checkpoint reprocessed already-committed files")
  }

  test("streaming EWMA (mapGroupsWithState) EQUALS the q144 batch fold across chunked in-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the full sf0.001 event log, globally ts-ordered, delivered as 3
    // micro-batches: the per-user state must carry the recurrence across
    // batch boundaries to reproduce the batch fold bit-for-bit
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.ewmaPerUser(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("ewma_stream").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // update mode re-emits touched users per batch; the final state is
      // the row with the highest n_events per user (n is monotone)
      val got = spark.table("ewma_stream")
        .groupBy($"user_id")
        .agg(max(struct($"n_events", $"ewma_cents")).as("m"))
        .select($"user_id", $"m.n_events", $"m.ewma_cents")
        .as[(Long, Long, Long)].collect().toSet
      val batch = SparkEntry.queries("q144_ewma")(spark, sf)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == batch,
        s"streaming EWMA diverged from the batch fold: ${got.size} vs ${batch.size} users")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming funnel (mapGroupsWithState) EQUALS the q152 batch chain across chunked in-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.funnelPerUser(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_stream").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // last emission per user: stage is monotone non-decreasing under
      // in-order delivery, and the chain timestamps only ever fill, so
      // max(struct(stage, ...)) picks the final state
      val got = spark.table("funnel_stream")
        .groupBy($"user_id")
        .agg(max(struct($"stage", $"v_ts", $"c_ts", $"p_ts")).as("m"))
        .select($"user_id", $"m.stage", $"m.v_ts", $"m.c_ts", $"m.p_ts")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      val batch = SparkEntry.queries("q152_funnel")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      assert(got == batch,
        s"streaming funnel diverged from the batch chain: ${got.size} vs ${batch.size} users")
      assert(got.nonEmpty && got.exists(_._2 == 3L), "fixture should complete some funnels")
    } finally q.stop()
  }

  test("streaming as-of attribution (flatMapGroupsWithState) EQUALS the q34 batch as-of join across chunked in-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.asofPerUser(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_stream").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // append mode: each error emitted exactly once, in its batch
      val got = spark.table("asof_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val batch = SparkEntry.queries("q34_asof_join")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == batch,
        s"streaming as-of diverged from the batch join: ${got.size} vs ${batch.size} errors")
      assert(got.nonEmpty && got.exists(_._3 == -1L) && got.exists(_._3 >= 0L),
        "fixture should exercise both attributed and unattributed errors")
      // exactly-once per error: no duplicate emission across batches
      assert(spark.table("asof_stream").count() == got.size)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched purchase emits its null row once the watermark proves no click can arrive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val joined = EventStream.attributionJoinOuter(input.toDF(), horizonMinutes = 30)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_outer").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
        EventStream.Event(2, ts("2024-01-01 10:10:00"), 1L, "purchase", 9.0),
        EventStream.Event(3, ts("2024-01-01 10:15:00"), 2L, "purchase", 7.0)) // no click
      q.processAllAvailable()
      // the matched row emits immediately; the null row must NOT yet —
      // a qualifying click for user 2 could still arrive
      val early = spark.table("attr_outer")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(early == Set((2L, 1L)), s"inner match should emit first, got $early")

      // advance BOTH branch watermarks (global = min of the two, and each
      // only advances on data flowing through ITS branch) far past
      // purchase_ts + horizon, then one more batch so the state-eviction
      // pass emits the null row. The 13:00+ pairs inner-match each other
      // (click_ts == purchase_ts is inside the horizon) and emit eagerly.
      input.addData(
        EventStream.Event(4, ts("2024-01-01 13:00:00"), 9L, "click", 0.0),
        EventStream.Event(5, ts("2024-01-01 13:00:00"), 9L, "purchase", 1.0))
      q.processAllAvailable()
      input.addData(
        EventStream.Event(6, ts("2024-01-01 13:30:00"), 8L, "click", 0.0),
        EventStream.Event(7, ts("2024-01-01 13:30:00"), 8L, "purchase", 1.0))
      q.processAllAvailable()

      val got = spark.table("attr_outer")
        .select($"purchase_id", $"click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == Set((2L, 1L), (5L, 4L), (7L, 6L), (3L, -1L)),
        s"unmatched purchase must surface with null click after the watermark: $got")
    } finally q.stop()
  }

  test("exactly-once sink: crash AFTER the write, BEFORE the commit — restart emits no duplicates") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("eo_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("eo_out").toString + "/data"
    val src = s"$sf/events*.parquet"
    // injected fault: the first delivery dies after its files are written
    // but before the checkpoint commit — the at-least-once crash window
    @volatile var injected = false
    def start() = EventStream.exactlyOnceFileSink(
      EventStream.readEvents(spark, src).select($"event_id", $"event_type"),
      out, ckpt,
      onBatch = _ => if (!injected) { injected = true; sys.error("injected crash after sink write") })
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    q1.stop()
    // the pre-crash write really landed: without idempotence the restart
    // would now duplicate every one of these rows
    val preCrash = spark.read.parquet(out).count()
    assert(preCrash > 0, "fault was injected before the sink write — test proves nothing")

    val q2 = start() // same checkpoint: batch 0 is redelivered
    try q2.processAllAvailable() finally q2.stop()
    val expected = Tables.events(spark, sf).count()
    val got = spark.read.parquet(out)
    assert(got.count() == expected, "restart duplicated or dropped rows")
    assert(got.select("event_id").distinct().count() == expected,
      "duplicate event_ids after redelivery — batchId-keyed overwrite failed")
  }

  test("streaming CDC apply: foreachBatch + Merge.upsert maintains a versioned snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_snap").toString
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.parquet(s"$dir/v0")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double, String)]
    // each micro-batch advances the snapshot one version: vN + changes →
    // vN+1 (overwrite mode = idempotent on batch replay). This is the
    // operators composing: the streaming surface feeding the MERGE
    // operator, i.e. a minimal incremental lake table.
    val q = input.toDF().toDF("k", "name", "v", "op")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val cur = spark.read.parquet(s"$dir/v$id")
        graft.operators.Merge.upsert(cur, batch, "k")
          .write.mode("overwrite").parquet(s"$dir/v${id + 1}")
      }
      .start()
    try {
      input.addData((2L, "B", 9.0, "U"), (3L, "c", 3.0, "U"))   // update + insert
      q.processAllAvailable()
      input.addData((1L, "", 0.0, "D"), (4L, "d", 4.0, "U"))    // delete + insert
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/v2")
        .orderBy($"k").as[(Long, String, Double)].collect().toSeq
      assert(got == Seq((2L, "B", 9.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    } finally q.stop()
  }

  test("sessionize: event-time gap closes the session when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(input.toDS(), gapMinutes = 1)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:30")
      input.addData(
        EventStream.Event(1, t0, 42L, "click", 1.0),
        EventStream.Event(2, t1, 42L, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session still open

      // a much later event advances the watermark past 10:01:30 → timeout
      input.addData(EventStream.Event(3,
        java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "click", 1.0))
      q.processAllAvailable()
      // one more batch so the timed-out state is evaluated
      input.addData(EventStream.Event(4,
        java.sql.Timestamp.valueOf("2024-01-01 11:00:01"), 7L, "click", 1.0))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .select($"user_id", $"n_events", $"total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((42L, 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupStream drops re-delivered event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val deduped = EventStream.dedupStream(
      input.toDS().toDF(), watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData(EventStream.Event(1, t, 1L, "click", 1.0))
      q.processAllAvailable()
      // same event re-delivered in a later batch + one new event
      input.addData(
        EventStream.Event(1, t, 1L, "click", 1.0),
        EventStream.Event(2, t, 1L, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select($"event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("windowed streaming quantiles (append mode): every closed window's estimate is within its emitted bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => EventStream.Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(_.ts.getTime)
    val (chunk1, chunk2) = all.splitAt(all.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.windowedQuantiles(input.toDS().toDF(), Seq(500))
      .writeStream.outputMode("append").format("memory")
      .queryName("win_kll").start()
    try {
      input.addData(chunk1.toIndexedSeq)
      q.processAllAvailable()
      input.addData(chunk2.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("win_kll").collect()
      // append mode withholds the trailing 2h of windows; everything
      // older must have emitted
      assert(got.nonEmpty, "watermark never closed a window")
      // batch truth per (window, type): exact per-window value multisets
      val batch = Tables.events(spark, sf)
        .select(unix_micros(date_trunc("hour", $"ts")).as("w"), $"event_type",
          ($"value" * 100).cast("long").as("v100"))
        .as[(Long, String, Long)].collect()
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted).toMap
      got.foreach { r =>
        val key = (r.getLong(0), r.getString(1))
        val (n, err, v) = (r.getLong(2), r.getLong(3), r.getLong(4))
        val exact = batch(key)
        assert(n == exact.length, s"$key: streamed n=$n vs ${exact.length}")
        val target = (500 * n + 999) / 1000
        val trueRank = exact.count(_ <= v).toLong
        assert(trueRank >= target - err && trueRank <= n,
          s"$key: v=$v trueRank=$trueRank target=$target err=$err")
      }
      // no window emitted twice (append-mode exactly-once per closed window)
      assert(got.map(r => (r.getLong(0), r.getString(1))).distinct.length == got.length)
    } finally q.stop()
  }

  test("streaming fingerprint dedup equals batch dropDuplicates(fp), chunked and re-delivered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))
    val (chunk1, chunk2) = all.splitAt(all.length / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
    // watermark far beyond the fixture's time span: no state evicts, so
    // the streaming answer must EQUAL the global batch dedup exactly
    val deduped = EventStream.dedupByFingerprint(
      input.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      watermark = "3650 days")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("fp_dedup").start()
    try {
      input.addData(chunk1.toIndexedSeq)
      q.processAllAvailable()
      // chunk1 RE-DELIVERED in full alongside the new chunk: every
      // re-delivered row is a content duplicate and must be dropped
      input.addData((chunk1 ++ chunk2).toIndexedSeq)
      q.processAllAvailable()
      val gotFps = spark.table("fp_dedup").select($"fp").as[String].collect().toSeq
      assert(gotFps.distinct.size == gotFps.size, "stream emitted a duplicate fingerprint")
      val batchFps = Tables.events(spark, sf)
        .select(graft.functions.TextFns.fingerprint($"props").as("fp"))
        .distinct().as[String].collect().toSet
      assert(gotFps.toSet == batchFps,
        s"stream kept ${gotFps.size} fps, batch has ${batchFps.size}")
    } finally q.stop()
  }

  test("streaming CJK dedup: ASCII fingerprint drops distinct docs as dupes; unicode mode keeps them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three DISTINCT Chinese payloads + one true duplicate of the first
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "doc", 0.0, "数据处理引擎"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L, "doc", 0.0, "大规模分布式计算"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 1L, "doc", 0.0, "机器学习"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), 1L, "doc", 0.0, "数据处理引擎"))
    def run(unicode: Boolean, name: String): Seq[Long] = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      val q = EventStream.dedupByFingerprint(
          input.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          watermark = "3650 days", unicode = unicode)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        input.addData(rows.toIndexedSeq); q.processAllAvailable()
        spark.table(name).select($"event_id").as[Long].collect().toSeq.sorted
      } finally q.stop()
    }
    // the trap: every pure-CJK payload ASCII-normalizes to "" -> ONE
    // fingerprint -> events 2 and 3 are dropped as "duplicates" of 1
    assert(run(unicode = false, "fp_ascii_cjk") == Seq(1L))
    // the fix: unicode fingerprints keep the three distinct docs and
    // still drop the true duplicate (event 4)
    assert(run(unicode = true, "fp_uni_cjk") == Seq(1L, 2L, 3L))
  }

  test("streaming NFC dedup parity: raw unicode mode keeps an NFD re-encoding; normalize mode drops it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch tiers' normalize flag in its streaming twin: the same
    // accented payload arrives composed, then decomposed (a re-crawl
    // through a different encoder) — byte-distinct, so the raw unicode
    // fingerprint keeps both; the flag keys on NFC and drops the
    // re-encoding. Explicit escapes (the NfcFixture discipline).
    val composed = "donn\u00E9es trait\u00E9es \u00E0 grande \u00E9chelle"
    val decomposed = java.text.Normalizer
      .normalize(composed, java.text.Normalizer.Form.NFD)
    assert(decomposed != composed)
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "doc", 0.0, composed),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L, "doc", 0.0, decomposed),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 1L, "doc", 0.0, "autre document distinct"))
    def run(normalize: Boolean, name: String): Seq[Long] = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      val q = EventStream.dedupByFingerprint(
          input.toDS().toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          watermark = "3650 days", unicode = true, normalize = normalize)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        input.addData(rows.toIndexedSeq); q.processAllAvailable()
        spark.table(name).select($"event_id").as[Long].collect().toSeq.sorted
      } finally q.stop()
    }
    assert(run(normalize = false, "fp_nfc_raw") == Seq(1L, 2L, 3L),
      "raw unicode fingerprints are byte-distinct across encodings")
    assert(run(normalize = true, "fp_nfc_norm") == Seq(1L, 3L),
      "the flag must drop the NFD re-encoding and keep the distinct doc")
  }

  test("session_window agg groups events by event-time gaps") {
    import spark.implicits._
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 42L, "click", 1.0, ""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 42L, "view", 2.0, ""),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 42L, "click", 4.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // session_window also works on batch DataFrames — verify grouping there
    val got = EventStream.sessionWindowAgg(batch, "30 minutes")
      .orderBy($"session_start")
      .select($"n_events", $"total_value")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 3.0), (1L, 4.0)))
  }

  test("streaming session_window EQUALS the q156 batch sessionization once the watermark closes every session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.sessionWindowAgg(input.toDS().toDF(), "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_stream").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // append mode emits a session only when the watermark passes its
      // end (last event + gap): a far-future sentinel for a user id no
      // real row uses pushes the watermark past every real session; the
      // sentinel's own session stays open and is never emitted
      val maxTs = all.map(_.ts.getTime).max
      input.addData(Seq(EventStream.Event(-1L,
        new java.sql.Timestamp(maxTs + 86400L * 1000), -1L, "click", 0.0)))
      q.processAllAvailable()
      val got = spark.table("session_stream").filter($"user_id" >= 0)
        .select($"user_id", unix_micros($"session_start").as("s"),
          unix_micros($"session_end").as("e"), $"n_events", $"total_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      val batch = SparkEntry.queries("q156_session_windows")(spark, sf)
        .select($"user_id", $"session_start_us", $"session_end_us",
          $"n_events", $"sum_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == batch,
        s"streaming sessions diverged from batch: ${got.size} vs ${batch.size}")
      assert(got.size > 100, "fixture should produce many sessions")
    } finally q.stop()
  }

  test("streaming chunk-pair state (complete mode) EQUALS batch chunkPairState, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.ChunkDedup
    // the ChunkDedupSpec planted-paragraph fixture shape: a shared ~900
    // char paragraph hosted at three different offsets + noise docs, so
    // the state table carries real cross-doc chunk rows
    val para = (0 until 160).map(i => s"w${i * 7 % 101}x${i % 13}").mkString(" ")
    val docs = Seq(
      (1L, para),
      (2L, "pfx shifted by a short pad " + para),
      (3L, "a different preamble here " + para + " and a coda"),
      (4L, "totally unrelated content qq rr ss tt uu vv ww xx yy zz"),
      (5L, "short"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // the SAME shared definitions end-to-end: cdcChunks is stateless
    // per-row (chunking a doc needs no cross-row state), chunkPairState
    // is a distinct-free aggregation — both stream as written
    val q = ChunkDedup.chunkPairState(
        ChunkDedup.cdcChunks(input.toDS().toDF("doc_id", "text"), "doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("chunk_state_stream").start()
    try {
      val (c1, c2) = docs.splitAt(2)
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"chunk_hash", $"doc_id", $"n_occ", $"len")
        .as[(String, Long, Long, Long)].collect().toSet
      val got = toSet(spark.table("chunk_state_stream"))
      val batch = toSet(ChunkDedup.chunkPairState(
        ChunkDedup.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text")))
      assert(got == batch,
        s"streaming chunk-pair state diverged from batch: ${got.size} vs ${batch.size} rows")
      // the state feeds the incremental consumer identically: shared
      // chunk hashes span the three hosts
      val crossDoc = batch.groupBy(_._1).filter(_._2.map(_._2).size >= 3)
      assert(crossDoc.nonEmpty, "fixture produced no chunk shared by all three hosts")
    } finally q.stop()
  }

  test("streaming bigram-LM count state (complete mode) EQUALS batch model counts, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.NgramLm
    // a streaming ingest maintains the LM's count tables directly: the
    // bigram derivation is stateless per-row and the count aggregation
    // is distinct-free — same shared definitions as batch train()
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran up the hill"),
      (3L, "a dog sat on a log"),
      (4L, "solo"),
      (5L, "the dog ran"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = NgramLm.docBigrams(input.toDS().toDF("doc_id", "text"))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("lm_bigram_state").start()
    try {
      val (c1, c2) = docs.splitAt(2)
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"w1", $"w2", $"c12").as[(String, String, Long)].collect().toSet
      val got = toSet(spark.table("lm_bigram_state"))
      val batch = toSet(NgramLm.train(docs.toDF("doc_id", "text")).bigrams)
      assert(got == batch,
        s"streaming bigram counts diverged from batch train(): ${got.size} vs ${batch.size}")
      // counts that cross the micro-batch boundary really merged
      assert(got.contains(("the", "cat", 2L)))
    } finally q.stop()
  }

  test("streaming script-mix routing (routeCounts, complete mode) EQUALS the batch aggregate, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // multilingual fixture covering all three dominant classes plus
    // mixed-script docs whose class is decided by the tie order
    val docs = Seq(
      (1L, "数据处理引擎 big data"),
      (2L, "hello world one two three"),
      (3L, "42 7 999 1234"),
      (4L, "深度学习 模型 训练 数据 分布式 计算"),
      (5L, "mixed 中文 and english 123 456"),
      (6L, "7 8 9 10 11 twelve"),
      (7L, "edge case 机器 equal mix 学习"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.operators.ScriptMix.routeCounts(input.toDS().toDF("doc_id", "txt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("scriptmix_route").start()
    try {
      // chunked delivery: the complete-mode aggregation must carry the
      // ≤3 rows of routing state across micro-batch boundaries
      val (chunk1, chunk2) = docs.splitAt(4)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"main_class", $"n_docs", $"total_tokens", $"total_ideo", $"total_digit")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val got = toSet(spark.table("scriptmix_route"))
      val batch = toSet(graft.operators.ScriptMix.routeCounts(docs.toDF("doc_id", "txt")))
      assert(batch.map(_._1) == Set("ideo", "alpha", "digit"),
        s"fixture must exercise all three routing classes, got ${batch.map(_._1)}")
      assert(got == batch,
        s"streaming routeCounts diverged from the batch aggregate: $got vs $batch")
    } finally q.stop()
  }

  test("streaming sketch distinct (HLL + bitmap) equals batch, chunked across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .collect()
      .map(r => EventStream.Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val (chunk1, chunk2) = all.splitAt(all.length / 2)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event]
    val q = EventStream.sketchDistinct(input.toDS().toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("sketch_distinct").start()
    try {
      input.addData(chunk1.toIndexedSeq)
      q.processAllAvailable()
      input.addData(chunk2.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("sketch_distinct")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // batch truth on the SAME rows: exact countDistinct and the same
      // HLL sketch — max-based registers make streaming == batch exact,
      // and the bitmap's OR-merge across micro-batch state must be exact
      val batch = Tables.events(spark, sf)
        .groupBy($"event_type")
        .agg(
          hll_sketch_estimate(hll_sketch_agg($"user_id", 12)).as("approx"),
          countDistinct($"user_id").as("exact"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (et, (approx, exact)) =>
        assert(exact == batch(et)._2, s"$et: bitmap $exact != countDistinct ${batch(et)._2}")
        assert(approx == batch(et)._1, s"$et: streaming HLL $approx != batch HLL ${batch(et)._1}")
      }
    } finally q.stop()
  }

  test("streaming HTML crawl ingest (htmlExtract, append mode) EQUALS batch q191 extraction, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the REAL q191 fixture tail: the last generated pages plus every
    // edge doc (empty, script-only, markup-free, double-encoded,
    // unclosed-tag, link-only, vertical-tab) — the docs most likely to
    // diverge if the streaming path ever stops sharing the definition
    val fixture = spark.read
      .parquet(graft.queries.TextQueries.HtmlFixture.ensure(spark))
      .filter($"doc_id" >= 1195L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 12, s"expected 5 tail pages + 7 edge docs, got ${fixture.size}")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // stateless per-row scalar chain -> append mode, no watermark, no
    // state store: the crawl-ingest shape (extraction at the edge,
    // curation downstream of the extracted columns)
    val q = graft.functions.TextFns
      .htmlExtract(input.toDS().toDF("doc_id", "html"), "doc_id", "html")
      .writeStream.outputMode("append").format("memory")
      .queryName("html_ingest").start()
    try {
      val (chunk1, chunk2) = fixture.splitAt(6)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_links", $"link_chars", $"text_chars", $"link_permille", $"text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getString(5))).toSet
      val got = toSet(spark.table("html_ingest"))
      val batch = toSet(graft.functions.TextFns.htmlExtract(
        fixture.toDF("doc_id", "html"), "doc_id", "html"))
      assert(batch.exists(_._5 == 1000L), "fixture must include the link-only permille=1000 edge")
      assert(batch.exists(r => r._6.isEmpty && r._4 == 0L), "fixture must include an empty-text edge")
      assert(got == batch,
        s"streaming htmlExtract diverged from batch: ${got.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming PII ingest scrub (piiFrame, append mode) EQUALS batch q195/q196, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // every edge doc of the PII fixture (the boundary set PiiSpec pins
    // by hand) plus a slice of generated planted docs — the scrub runs
    // at the ingest edge in a real pipeline, so the streaming path must
    // share the ONE piiFrame definition, not re-derive the patterns
    val fixture = spark.read
      .parquet(graft.queries.CurationQueries.PiiFixture.ensure(spark))
      .filter($"doc_id" >= 1190L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 32, s"expected 10 generated + 22 edge docs, got ${fixture.size}")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // stateless per-row scalar chain -> append mode, no watermark, no
    // state store (the htmlExtract twin's shape)
    val q = graft.functions.PiiFns
      .piiFrame(input.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("pii_ingest").start()
    try {
      val (chunk1, chunk2) = fixture.splitAt(12)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"email_count", $"ip_count", $"phone_count",
          $"ssn_count", $"iban_count", $"cc_count", $"pii_total", $"has_pii",
          $"residual_pii", $"redacted")
        .collect().map(r => (r.getLong(0), (1 to 9).map(r.getLong(_)).toSeq,
          r.getString(10))).toSet
      val got = toSet(spark.table("pii_ingest"))
      val batch = toSet(graft.functions.PiiFns.piiFrame(
        fixture.toDF("doc_id", "text"), "doc_id", "text"))
      assert(batch.exists(_._2(7) == 1L), "fixture slice must include PII-bearing docs")
      assert(batch.exists(_._2(5) > 0L), "fixture slice must include a Luhn-valid card doc")
      assert(batch.forall(_._2(8) == 0L), "residual must be zero everywhere")
      assert(got == batch,
        s"streaming piiFrame diverged from batch: ${got.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming quality-gate ingest (gopherGateFrame, append mode) EQUALS batch q194, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the GopherFixture tail: last generated docs plus every gate edge
    // (empty, whitespace-only, all-duplicate, spam, all-pass prose,
    // tokenizer pin) — stateless scalar chain, the htmlExtract/pii
    // twin shape, sharing the ONE gopherGateFrame definition
    val fixture = spark.read
      .parquet(graft.queries.CurationQueries.GopherFixture.ensure(spark))
      .filter($"doc_id" >= 995L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 17, s"expected 5 generated + 12 edge docs, got ${fixture.size}")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.functions.TextFns
      .gopherGateFrame(input.toDS().toDF("doc_id", "text"), "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("gate_ingest").start()
    try {
      val (chunk1, chunk2) = fixture.splitAt(9)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_words", $"mean_word_len_milli", $"symbol_permille",
          $"alpha_word_permille", $"stop_hits", $"pass_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val got = toSet(spark.table("gate_ingest"))
      val batch = toSet(graft.functions.TextFns.gopherGateFrame(
        fixture.toDF("doc_id", "text"), "text"))
      assert(batch.exists(_._7 == 1L) && batch.exists(_._7 == 0L),
        "fixture slice must carry both gate outcomes")
      assert(got == batch,
        s"streaming gopherGateFrame diverged from batch: ${got.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming canonical-URL dedup state (complete mode) EQUALS batch q198 on a mid-group split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ten 4-variant pages plus every edge doc; chunks split INSIDE the
    // variant groups so the canonical-count state must merge across
    // micro-batches — the stateful half of the URL tier (the scalar
    // canonicalization itself is covered by the PII/html twin shape)
    val fixture = spark.read
      .parquet(graft.queries.CurationQueries.UrlFixture.ensure(spark))
      .filter($"doc_id" % 250L < 10L || $"doc_id" >= 5000L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 55, s"expected 40 variant docs + 15 edges, got ${fixture.size}")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.functions.UrlFns
      .canonicalFrame(input.toDS().toDF("doc_id", "url"), "doc_id", "url")
      .groupBy($"canonical")
      .agg(min($"doc_id").as("survivor_id"), count(lit(1)).as("n_dups"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("url_dedup_state").start()
    try {
      // split at 25: every generated page has variants on both sides
      val (chunk1, chunk2) = fixture.splitAt(25)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = toSet(spark.table("url_dedup_state"))
      val batch = toSet(graft.functions.UrlFns
        .canonicalFrame(fixture.toDF("doc_id", "url"), "doc_id", "url")
        .groupBy($"canonical")
        .agg(min($"doc_id").as("survivor_id"), count(lit(1)).as("n_dups")))
      assert(batch.count(_._3 == 4L) == 10, "ten collapsed 4-variant groups expected")
      assert(got == batch,
        s"streaming canonical-dedup state diverged from batch: ${got.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming BM25 ingest (foreachBatch stage-to-lake + append) EQUALS a batch-built index: postings, scalars, retrieval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Bm25
    // the deployment shape: stream → commit each micro-batch to the
    // lake → index append FROM THE COMMITTED FILES (postings lineage
    // rooted in durable parquet, not the transient micro-batch frame).
    // Closes the retrieval tier's three-implementation discipline:
    // batch build, incremental append (Bm25Spec pins == rebuild), and
    // streaming ingest — one definition, three execution modes.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(docs.size >= 30, s"fixture corpus too small: ${docs.size}")
    val dir = java.nio.file.Files.createTempDirectory("bm25_stream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    @volatile var idx: Option[Bm25.Index] = None
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val path = s"$dir/batch_$id"
        batch.write.mode("overwrite").parquet(path)
        val committed = spark.read.parquet(path)
        idx = Some(idx match {
          case None    => Bm25.build(committed, probeDuplicateIds = true)
          case Some(i) => Bm25.append(i, committed) // overlap probe stays ON
        })
      }
      .start()
    try {
      val chunks = docs.grouped((docs.size + 2) / 3).toSeq
      assert(chunks.size == 3, "want a bootstrap build plus two appends")
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val streamed = idx.get
      val batchIdx = Bm25.build(docs.toDF("doc_id", "text"))
      // scalars additive across micro-batches
      assert(streamed.nDocs == batchIdx.nDocs && streamed.totalTokens == batchIdx.totalTokens,
        s"scalars diverged: (${streamed.nDocs}, ${streamed.totalTokens}) vs (${batchIdx.nDocs}, ${batchIdx.totalTokens})")
      // posting table identical (tf AND the per-doc len folded per batch)
      def postings(i: Bm25.Index) = i.tfLen
        .select($"doc_id", $"token", $"tf", $"len")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(postings(streamed) == postings(batchIdx), "posting tables diverged")
      // retrieval: query-time df/idf over the appended index must rank
      // EXACTLY like the from-scratch build (no stored-weight staleness)
      val terms = Seq("table", "data", "query")
      def top(i: Bm25.Index) = Bm25.topk(i, terms, 10)
        .as[(Long, Long, Long)].collect().toSeq
      assert(top(streamed) == top(batchIdx), "retrieval diverged from batch build")
    } finally q.stop()
  }

  test("streaming normalized-dedup state (complete mode) EQUALS batch q207 on a mid-cluster split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the NFC tier's stateful half: encoding variants of the same
    // logical page arrive in DIFFERENT micro-batches (base forms first,
    // NFD/mixed later), so the md5(nfc)-keyed count state must merge
    // across batches — the canonical-URL dedup twin's shape with the
    // normalization key
    val fixture = spark.read
      .parquet(graft.queries.TextQueries.NfcFixture.ensure(spark))
      .filter($"doc_id" % 1000L < 20L || $"doc_id" >= 5000L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 69, s"expected 60 variant docs + 9 edges, got ${fixture.size}")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // streaming aggregation cannot carry countDistinct (and the fixture
    // has no identical-raw duplicates, so n_docs >= 2 is equivalent to
    // q207's n_raw_variants >= 2 here — the batch side asserts it)
    def dedupState(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id",
        md5(graft.functions.NfcNormalize($"text").cast("binary")).as("norm_md5"))
      .groupBy($"norm_md5")
      .agg(min($"doc_id").as("survivor_id"), count(lit(1)).as("n_docs"))
    val q = dedupState(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("nfc_dedup_state").start()
    try {
      // split between the base forms (ids < 1000) and the NFD/mixed
      // variants — every 3-variant cluster crosses the boundary
      val (bases, variants) = fixture.partition(_._1 < 1000L)
      input.addData(bases)
      q.processAllAvailable()
      input.addData(variants)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .filter($"n_docs" >= 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = toSet(spark.table("nfc_dedup_state"))
      val batchDf = fixture.toDF("doc_id", "text")
      val batch = toSet(dedupState(batchDf))
      // equivalence premise: no identical-raw duplicates in the slice,
      // so every multi-doc cluster is raw-distinct (the q207 filter)
      assert(batchDf.select(md5($"text".cast("binary"))).distinct().count() ==
        fixture.size.toLong)
      assert(batch.count(_._3 == 3L) == 20, "twenty 3-variant clusters expected")
      assert(got == batch,
        s"streaming normalized-dedup state diverged: ${got.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming exact-substring dedup (foreachBatch + persisted anchor state) EQUALS batch q201 across batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.SubstrDedup
    // three-implementation closure for the substring tier: batch (q201
    // gate), incremental (SubstrDedupSpec merge rule), and THIS — the
    // merge rule driven as a streaming job with persisted anchor/span
    // state. License and Sent60 plants live in BOTH halves of the id
    // space, so cross-batch spans only appear if dupSpansAgainst plus
    // the interval-union merge actually work against the state.
    val fixture = spark.read
      .parquet(graft.queries.DedupQueries.SubstrFixture.ensure(spark))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("substr_stream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    @volatile var spansPath: Option[String] = None
    @volatile var docPaths: List[String] = Nil
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val path = s"$dir/docs_$id"
        batch.write.mode("overwrite").parquet(path)
        val committed = spark.read.parquet(path)
        val newSpans = spansPath match {
          case None =>
            SubstrDedup.dupSpans(committed)
          case Some(prev) =>
            val oldDocs = spark.read.parquet(docPaths: _*)
            val oldAnchors = spark.read.parquet(s"$dir/anchors")
            val against = SubstrDedup.dupSpansAgainst(committed, oldDocs, oldAnchors)
            val na = SubstrDedup.anchors(committed)
            val touched = oldAnchors
              .join(na.select($"anchor").distinct(), Seq("anchor"), "left_semi")
              .select($"doc_id").distinct()
            val oldSpans = spark.read.parquet(prev)
            oldSpans.join(touched, Seq("doc_id"), "left_anti")
              .unionByName(SubstrDedup.mergeSpans(
                oldSpans.join(touched, Seq("doc_id"), "left_semi")
                  .select("doc_id", "span_idx", "span_start", "span_end", "span_len")
                  .unionByName(against)))
        }
        val out = s"$dir/spans_$id"
        newSpans.write.mode("overwrite").parquet(out)
        SubstrDedup.anchors(committed).write.mode("append").parquet(s"$dir/anchors")
        spansPath = Some(out)
        docPaths = path :: docPaths
      }
      .start()
    try {
      val chunks = Seq(
        fixture.filter(_._1 < 500L),
        fixture.filter(d => d._1 >= 500L && d._1 < 1000L),
        fixture.filter(_._1 >= 1000L))
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val streamed = spark.read.parquet(spansPath.get)
        .collect().map(_.toSeq).toSet
      val batchSpans = SubstrDedup.dupSpans(fixture.toDF("doc_id", "text"))
        .collect().map(_.toSeq).toSet
      assert(batchSpans.nonEmpty)
      // cross-batch evidence: some span belongs to a doc in the FIRST
      // half whose only partners live in the second half (suffix-Sent60
      // docs have ids >= 500) — present only if the state path works
      assert(streamed == batchSpans,
        s"streaming substring dedup diverged: ${streamed.size} vs ${batchSpans.size} spans")
    } finally q.stop()
  }

  test("streaming decontamination (foreachBatch, benchmarks as micro-batches vs persisted train anchors) EQUALS batch contaminationSpans") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.SubstrDedup
    // the dupSpansAgainst streaming discipline with the sides swapped:
    // the TRAIN side is the fixed, already-ingested corpus (its anchor
    // state persisted once); BENCHMARK docs arrive as micro-batches and
    // each batch's contaminationSpansAgainst output merges into the
    // stored manifest by interval union — mergeSpans(state ∪ new) is the
    // whole update rule because contamination is union semantics over
    // the benchmark set (re-delivery would be idempotent, unlike the
    // dedup twin's disjointness-guarded pair state). Wave 2 is a
    // no-contamination batch (state must pass through unchanged); waves
    // 1 and 3 carry overlapping license fragments so a train doc's span
    // must GROW across batches.
    val fx = spark.read
      .parquet(graft.queries.DedupQueries.SubstrFixture.ensure(spark))
    val train = fx.filter($"doc_id" < 300L)
    val dir = java.nio.file.Files.createTempDirectory("decontam_stream").toString
    train.write.mode("overwrite").parquet(s"$dir/train")
    val trainLake = spark.read.parquet(s"$dir/train")
    SubstrDedup.anchors(trainLake).write.mode("overwrite").parquet(s"$dir/anchors")
    val trainAnchors = spark.read.parquet(s"$dir/anchors")
    val t9010 = fx.filter($"doc_id" === 9010L).head().getString(1)
    val lic = t9010.substring(0, t9010.indexOf(" unique middle bits "))
    val waves = Seq(
      Seq(9100L -> ("aaa " + lic.substring(0, 60) + " zzz")),
      Seq(9101L -> "this benchmark batch contaminates no training document at all",
        9102L -> ""),
      Seq(9103L -> ("qqq " + lic.substring(40) + " www")))
    @volatile var statePath: Option[String] = None
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val newSpans = SubstrDedup.contaminationSpansAgainst(
          batch, trainLake, trainAnchors)
        val merged = statePath match {
          case None => newSpans
          case Some(prev) =>
            SubstrDedup.mergeSpans(
              spark.read.parquet(prev).unionByName(newSpans))
        }
        val out = s"$dir/state_$id"
        merged.write.mode("overwrite").parquet(out)
        statePath = Some(out)
      }
      .start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      val streamed = spark.read.parquet(statePath.get)
        .collect().map(_.toSeq).toSet
      val allBench = waves.flatten.toDF("doc_id", "text")
      val batchAnswer = SubstrDedup.contaminationSpans(trainLake, allBench)
        .collect().map(_.toSeq).toSet
      assert(batchAnswer.nonEmpty)
      // the spans cover the full license (growth across waves actually
      // merged; flank spaces may extend by one char per side — see the
      // SubstrDedupSpec incremental-decontamination note)
      assert(batchAnswer.forall { s =>
        val len = s(4).asInstanceOf[Long]
        len >= lic.length.toLong && len <= lic.length + 2L
      })
      assert(streamed == batchAnswer,
        s"streaming decontamination diverged: ${streamed.size} vs ${batchAnswer.size} spans")
    } finally q.stop()
  }

  test("streaming decontamination with the normalize flag: an NFD-encoded bench leak is invisible raw, caught flagged, == flagged batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.SubstrDedup
    // the NfcSpec construction through the STREAMING leg: train carries
    // the NFC license, the arriving benchmark micro-batch carries its
    // NFD re-encoding — byte-distinct at every window, so a raw anchor
    // state can never see the leak; the flagged state + flagged probe
    // must equal the flagged batch answer
    val lic = java.text.Normalizer.normalize(
      (0 until 12).map(i => s"shar\u00E9d$i lic\u00EAnce$i").mkString(" "),
      java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(lic, java.text.Normalizer.Form.NFD)
    assert(nfd != lic)
    val train = Seq(
      1L -> ("unique head one." + lic + ",unique tail one"),
      2L -> "wholly unrelated training text sharing nothing with anything")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("decontam_nfc").toString
    train.write.mode("overwrite").parquet(s"$dir/train")
    val trainLake = spark.read.parquet(s"$dir/train")
    SubstrDedup.anchors(trainLake, normalize = true)
      .write.mode("overwrite").parquet(s"$dir/anchors_n")
    SubstrDedup.anchors(trainLake)
      .write.mode("overwrite").parquet(s"$dir/anchors_raw")
    val anchorsN = spark.read.parquet(s"$dir/anchors_n")
    val anchorsRaw = spark.read.parquet(s"$dir/anchors_raw")
    @volatile var statePath: Option[String] = None
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // the raw twin of the very same batch sees NOTHING — pinned
        // inside the stream so the contrast rides the streaming leg
        assert(SubstrDedup.contaminationSpansAgainst(
          batch, trainLake, anchorsRaw).count() == 0L)
        val newSpans = SubstrDedup.contaminationSpansAgainst(
          batch, trainLake, anchorsN, normalize = true)
        val merged = statePath match {
          case None => newSpans
          case Some(prev) => SubstrDedup.mergeSpans(
            spark.read.parquet(prev).unionByName(newSpans))
        }
        val out = s"$dir/state_$id"
        merged.write.mode("overwrite").parquet(out)
        statePath = Some(out)
      }
      .start()
    try {
      input.addData(Seq(9100L -> ("benchmark head;" + nfd + ":benchmark tail")))
      q.processAllAvailable()
      val streamed = spark.read.parquet(statePath.get)
        .collect().map(_.toSeq).toSet
      val bench = Seq(9100L -> ("benchmark head;" + nfd + ":benchmark tail"))
        .toDF("doc_id", "text")
      val batchAnswer = SubstrDedup
        .contaminationSpans(trainLake, bench, normalize = true)
        .collect().map(_.toSeq).toSet
      assert(batchAnswer.nonEmpty && batchAnswer.map(_.head) == Set(1L))
      assert(streamed == batchAnswer,
        s"flagged streaming decontamination diverged: $streamed vs $batchAnswer")
    } finally q.stop()
  }

  test("streaming TOKEN decontamination (benchmarks as micro-batches) EQUALS batch; spans grow across waves by token-interval union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{SubstrDedup, TokenDecontam}
    // the q213 tier through the streaming discipline: benchmark docs
    // arrive as micro-batches, each batch's token spans merge into the
    // stored manifest by interval union (the same union-semantics
    // argument as the char tier — coverage is a per-position property
    // of the benchmark SET, so disjoint benchmark subsets compose
    // through mergeSpans, in token coordinates). The two waves carry
    // OVERLAPPING 13-token fragments of the fixture's 17-token
    // sentence, so train doc 13's span must GROW across batches
    // (13-token spans per wave, the full 17 only after the union).
    val fx = spark.read
      .parquet(graft.queries.DedupQueries.TokenFixture.ensure(spark))
    val train = fx.filter($"doc_id" < 900L)
    val waves = Seq(
      Seq(9100L -> "aaa the data batch scan join stream merge sort fast key row zzz"),
      Seq(9101L -> "qqq batch scan join stream merge sort fast key row window www",
        9102L -> "this benchmark wave contaminates nothing in training"))
    val dir = java.nio.file.Files.createTempDirectory("tok_decontam_stream").toString
    @volatile var statePath: Option[String] = None
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val newSpans = TokenDecontam.contaminationTokenSpans(train, batch)
        val merged = statePath match {
          case None => newSpans
          case Some(prev) => SubstrDedup.mergeSpans(
            spark.read.parquet(prev).unionByName(newSpans))
        }
        val out = s"$dir/state_$id"
        merged.write.mode("overwrite").parquet(out)
        statePath = Some(out)
      }
      .start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
      val streamed = spark.read.parquet(statePath.get)
        .collect().map(_.toSeq).toSet
      val batchAnswer = TokenDecontam.contaminationTokenSpans(
          train, waves.flatten.toDF("doc_id", "text"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batchAnswer,
        s"streaming token decontamination diverged: $streamed vs $batchAnswer")
      // the union actually grew the span: the full 17-token sentence,
      // which neither wave alone covers (each fragment is 13 tokens)
      val d13 = batchAnswer.filter(_.head == 13L)
      assert(d13.size == 1 && d13.head(4) == 17L, s"doc 13 span: $d13")
    } finally q.stop()
  }

  test("streaming composed curation manifest (foreachBatch + incremental pair state) EQUALS batch q204 on a cross-batch dedup split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    // the LAST missing streaming twin: the gate, PII scrub, and URL
    // dedup each had one, but the COMPOSED per-doc decision record did
    // not. Deployment shape: each micro-batch commits its docs to the
    // lake, its shingles extend the persisted index, and its pairs come
    // from jaccardPairs(new) ∪ jaccardPairsAgainst(new, index) — the
    // completeness identity Dedup pins. The near-dup copies arrive in a
    // LATER batch than their originals, so victimhood is only correct
    // if the incremental pair state actually works across batches.
    val slice = spark.read
      .parquet(graft.queries.CurationQueries.CurationFixture.ensure(spark))
      .filter($"doc_id" < 60L ||
        ($"doc_id" >= 1000L && $"doc_id" < 1060L) ||
        ($"doc_id" >= 2000L && $"doc_id" < 2060L))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(slice.size == 90, s"expected 60 originals + 15 + 15 copies, got ${slice.size}")
    val dir = java.nio.file.Files.createTempDirectory("manifest_stream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    @volatile var shIndex: Option[org.apache.spark.sql.DataFrame] = None
    val q = input.toDS().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val path = s"$dir/docs_$id"
        batch.write.mode("overwrite").parquet(path)
        val committed = spark.read.parquet(path)
        val shNew = Dedup.shingleSets(committed, "doc_id", "text", 3)
        val pairsNew = shIndex match {
          case None      => Dedup.jaccardPairs(shNew, 0.5)
          case Some(idx) => Dedup.jaccardPairs(shNew, 0.5)
            .unionByName(Dedup.jaccardPairsAgainst(shNew, idx, 0.5))
        }
        pairsNew.write.mode("append").parquet(s"$dir/pairs")
        shNew.write.mode("append").parquet(s"$dir/sh")
        shIndex = Some(spark.read.parquet(s"$dir/sh"))
      }
      .start()
    try {
      // originals split across two batches, every copy in the third —
      // all dedup pairs cross a micro-batch boundary
      val (originals, copies) = slice.partition(_._1 < 60L)
      val chunks = originals.grouped((originals.size + 1) / 2).toSeq :+ copies
      assert(chunks.size == 3)
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      def manifest(docs: org.apache.spark.sql.DataFrame,
                   pairs: org.apache.spark.sql.DataFrame) =
        graft.queries.CurationQueries.webCurationManifest(docs, pairs)
          .collect().map(_.toSeq).toSet
      val streamed = manifest(
        spark.read.parquet(s"$dir/docs_*"), spark.read.parquet(s"$dir/pairs"))
      val sliceDf = slice.toDF("doc_id", "lang", "text")
      val batchM = manifest(sliceDf,
        Dedup.jaccardPairs(Dedup.shingleSets(sliceDf, "doc_id", "text", 3), 0.5))
      assert(batchM.exists(r => r(6) == 1L) && batchM.exists(r => r(6) == 0L),
        "slice must exercise both keep values")
      assert(batchM.count(r => r(5) == 1L) == 30,
        "every copy must be a victim in the batch reference")
      assert(streamed == batchM,
        s"streaming composed manifest diverged: ${streamed.size} vs ${batchM.size} rows")
    } finally q.stop()
  }

  test("streaming CCNet bucket tagging (foreachBatch vs FROZEN model + cutoffs) EQUALS the batch terciles, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.NgramLm
    import graft.queries.CurationQueries
    // the q214 deployment split: the LM and the per-language tercile
    // cutoffs are estimated OFFLINE and FROZEN; the stream is a
    // stateless score+tag tier (per-doc scoring touches only the doc's
    // own bigrams against the static model tables; the cut table
    // broadcasts). Re-estimating terciles INSIDE the stream would be
    // unbounded state — a percentile over all history — which is
    // exactly why CCNet freezes them; this twin pins that the frozen
    // tier alone reproduces the batch q214 body across batch splits.
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(docs.size >= 30, s"fixture corpus too small: ${docs.size}")
    val all = docs.toDF("doc_id", "lang", "text")
    val model = NgramLm.train(all)
    def scoreTag(in: org.apache.spark.sql.DataFrame,
                 cuts: org.apache.spark.sql.DataFrame) =
      CurationQueries.ccnetTag(
        NgramLm.score(in, model)
          .join(in.select($"doc_id", $"lang"), Seq("doc_id"))
          .select($"doc_id", $"lang", $"avg_millibits"),
        cuts)
    val scoredAll = NgramLm.score(all, model)
      .join(all.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"doc_id", $"lang", $"avg_millibits")
    val cuts = CurationQueries.ccnetCuts(scoredAll)
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"lang", $"avg_millibits", $"bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    val batch = toSet(scoreTag(all, cuts))
    assert(batch.map(_._4) == Set("head", "middle", "tail"),
      "fixture must populate all three buckets")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val streamed = scala.collection.mutable.Set.empty[(Long, String, Long, String)]
    val q = input.toDS().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed ++= toSet(scoreTag(b.toDF(), cuts)); ()
      }
      .start()
    try {
      val chunks = docs.grouped((docs.size + 2) / 3).toSeq
      assert(chunks.size == 3, "want three micro-batches")
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(streamed.toSet == batch,
        s"chunked frozen-cut tagging diverged from batch: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming language identification (stateless predict vs a FROZEN model) EQUALS batch predict, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LangId
    // the LID deployment split (the q219/CCNet stage-1 shape): the
    // classifier trains OFFLINE on the labeled split and freezes; the
    // stream is a stateless score+argmin tier — per-doc scoring touches
    // only the doc's own grams against the static (broadcastable)
    // count tables, so the tier applies per micro-batch unchanged.
    // What is NOT stream-safe is re-training inside the stream (the
    // counts over all history are unbounded state) — same argument as
    // the frozen-cuts twin above.
    val fixture = spark.read.parquet(
      graft.queries.PipelineQueries.LangIdFixture.ensure(spark))
    val model = LangId.train(
      fixture.filter($"doc_id" % 1000 < 40 && $"doc_id" < 9000))
    val docs = fixture.select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = toSet(LangId.predict(fixture, model))
    assert(batch.map(_._2).size >= 5 && batch.exists(_._2 == "zh"),
      "all five fixture languages must appear among predictions")

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val streamed = scala.collection.mutable.Set.empty[(Long, String, Long, Long)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed ++= toSet(LangId.predict(b.toDF(), model)); ()
      }
      .start()
    try {
      val chunks = docs.grouped((docs.size + 2) / 3).toSeq
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(streamed.toSet == batch,
        s"chunked frozen-model LID diverged from batch: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming CCNet tagging from a RELOADED serving-pair artifact EQUALS batch, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{CcnetServing, NgramLm, TextModelSeam}
    import graft.queries.CurationQueries
    // the cross-SESSION version of the frozen-pair twin above: the
    // model + cuts persist as ONE CcnetServing artifact, and the
    // streaming tier reloads the scorer PER PARTITION from the blob
    // (nothing model-sized in any task closure) and broadcasts the
    // loaded cuts — the deployment where the estimating session and
    // the serving stream are different processes.
    val all = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text")
    val model = NgramLm.train(all)
    val scored = NgramLm.score(all, model)
      .join(all.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"doc_id", $"lang", $"avg_millibits")
    val cuts = CurationQueries.ccnetCuts(scored)
    val dir = java.nio.file.Files.createTempDirectory("ccnet_stream").toString
    CcnetServing.save(dir, TextModelSeam.localize(model), cuts)
    val pair = CcnetServing.load(spark, dir)
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"lang", $"avg_millibits", $"bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val batch = toSet(CurationQueries.ccnetTag(scored, cuts))

    val docs = all.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val streamed = scala.collection.mutable.Set.empty[(Long, String, Long, String)]
    val q = input.toDS().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed ++= toSet(CcnetServing.tag(spark, b.toDF(), pair.cuts,
          CcnetServing.scorerFactory(dir))); ()
      }
      .start()
    try {
      val chunks = docs.grouped((docs.size + 2) / 3).toSeq
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(streamed.toSet == batch,
        s"reloaded-pair streaming tagging diverged from batch: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming C4 line-cleaning ingest (c4KeptLines, append mode) EQUALS batch q216 cleaning, chunked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the C4Fixture edge tail (every planted rule) plus a generated
    // slice — stateless scalar HOF chain, the gopherGateFrame twin
    // shape, sharing the ONE TextFns.c4KeptLines definition: the
    // crawl-ingest deployment cleans lines as pages arrive, before any
    // stateful dedup tier sees them
    val fixture = spark.read
      .parquet(graft.queries.CurationQueries.C4Fixture.ensure(spark))
      .filter($"doc_id" >= 890L)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(fixture.size == 20, s"expected 10 generated + 10 edge docs, got ${fixture.size}")

    def cleanFrame(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          graft.functions.TextFns.c4KeptLines($"text")).cast("long").as("kept_lines"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.array_join(
            graft.functions.TextFns.c4KeptLines($"text"), "\n")).as("cleaned_md5"))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = cleanFrame(input.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("c4_ingest").start()
    try {
      val (chunk1, chunk2) = fixture.splitAt(11)
      input.addData(chunk1)
      q.processAllAvailable()
      input.addData(chunk2)
      q.processAllAvailable()
      def toSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"kept_lines", $"cleaned_md5")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val got = toSet(spark.table("c4_ingest"))
      val batch = toSet(cleanFrame(fixture.toDF("doc_id", "text")))
      assert(batch.exists(_._2 == 0L) && batch.exists(_._2 >= 3L),
        "fixture slice must carry both fully-scrubbed and surviving pages")
      assert(got == batch,
        s"streaming c4KeptLines diverged from batch: ${got.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming crawl ingest: .warc.gz shards as micro-batches through the q218 ladder EQUAL the batch extraction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.Warc
    // the live-crawl deployment: shard FILES arrive continuously, each
    // micro-batch demuxes its members, parses the HTTP layer, and runs
    // the extraction chain — all stateless per shard, so the whole
    // q218 ladder streams unchanged (the c4/gopher ingest-twin shape,
    // one layer deeper: three container formats inside the stream)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1).toSeq
    def page(text: String) =
      graft.queries.ExportQueries.PagePrefix + text + graft.queries.ExportQueries.PageSuffix
    val shards = docs.grouped(10).zipWithIndex.map { case (g, i) =>
      (i.toLong, Warc.buildShard(g.map { case (id, t) => (id, Warc.httpMessage(page(t))) }))
    }.toSeq
    assert(shards.size >= 5, s"want several shards, got ${shards.size}")

    def ladder(df: org.apache.spark.sql.Dataset[(Long, Array[Byte])]) = {
      val pages = df.flatMap { case (_, blob) =>
        Warc.parseShard(blob).map { r =>
          val http = Warc.parseHttp(r.payload)
          (r.url.substring(r.url.lastIndexOf('/') + 1).toLong, http.body)
        }
      }.toDF("doc_id", "html")
      graft.functions.TextFns.htmlExtract(pages, "doc_id", "html")
        .select($"doc_id", $"n_links", $"link_chars", $"text_chars",
          $"link_permille", org.apache.spark.sql.functions.md5($"text").as("text_md5"))
    }
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val batch = toSet(ladder(shards.toDS()))
    assert(batch.size == docs.size)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q = ladder(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("crawl_ingest").start()
    try {
      val (w1, w2) = shards.splitAt(shards.size / 2)
      input.addData(w1)
      q.processAllAvailable()
      input.addData(w2)
      q.processAllAvailable()
      val got = toSet(spark.table("crawl_ingest"))
      assert(got == batch,
        s"streaming crawl ladder diverged from batch: ${got.size} vs ${batch.size} rows")
    } finally q.stop()
  }

  test("streaming LID ROUTING (frozen artifact scorer in foreachBatch) EQUALS the q226 batch routed set, incl. a mid-stream low-margin casualty") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LangId
    import graft.queries.PipelineQueries
    // the q226 routing stage's deployment twin (VERDICT r17 #2): a
    // live-crawl pipeline routes IN-STREAM, so the frozen PRETRAINED
    // router loads from its artifact dir, localizes to the scalar
    // serving scorer (LangId.predictLocal — zero shuffles, nothing
    // model-sized re-aggregated per batch), and every micro-batch
    // applies the SAME length-normalized rule the batch chain uses.
    // The union over batches must equal the batch `routed` frame
    // exactly, and the planted mixed en/es page (9901) arrives
    // MID-stream and must route out — the casualty class only the
    // in-pipeline router can produce, exercised at serving time.
    val st = PipelineQueries.multiStages(spark)
    val model = LangId.train(
      spark.read.parquet(PipelineQueries.LangIdFixture.ensure(spark))
        .filter($"doc_id" % 1000 < 40 && $"doc_id" < 9000))
    val dir = java.nio.file.Files.createTempDirectory("route_lid").toString
    LangId.save(model, dir)
    val loaded = LangId.load(spark, dir)
    LangId.requireCompatible(loaded, 2)
    val scorer = LangId.localize(loaded)
    def routedSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"pred_lang", $"margin_millibits")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = routedSet(st.routed)
    val docs = st.cur.as[(Long, String)].collect().toSeq.sortBy(_._1)
    // rotate the routing casualty into the MIDDLE chunk explicitly —
    // a low-confidence doc arriving mid-stream, not at a batch edge
    val casualty = docs.filter(_._1 == 9901L)
    assert(casualty.nonEmpty, "the mixed-language page must survive to cur")
    val rest = docs.filterNot(_._1 == 9901L)
    val third = (rest.size + 2) / 3
    val chunks = Seq(rest.take(third),
      casualty ++ rest.slice(third, 2 * third), rest.drop(2 * third))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val streamed = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val pred = LangId.predictLocal(spark, b.toDF(), scorer)
        streamed ++= routedSet(b.toDF().join(pred, Seq("doc_id"))
          .filter($"margin_millibits" >=
            lit(PipelineQueries.RoutePerGramMillibits) * (length($"text") - 1)))
        ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      assert(streamed.toSet == batch,
        s"streamed routing diverged from batch: ${streamed.size} vs ${batch.size}")
      assert(!streamed.exists(_._1 == 9901L),
        "the low-margin mid-stream doc must route to 'und' and drop")
    } finally q.stop()
  }

  test("streaming GRADED quality scoring (frozen 4-class artifact in foreachBatch) EQUALS the q229 batch classification across a batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LangId
    import graft.queries.PipelineQueries
    // the q229 stage's deployment shape: FineWeb-Edu-style graded
    // scoring serves as a FROZEN classifier over the candidate stream
    // (training in-stream would be unbounded state — the frozen-cuts
    // argument); the scalar serving scorer is class-count-agnostic, so
    // the same predictLocal leg that routes languages grades quality.
    // The mid-grade pair lands in DIFFERENT micro-batches and must
    // grade exactly like the batch stage.
    val gs = PipelineQueries.gradedStages(spark)
    val dir = java.nio.file.Files.createTempDirectory("graded_stream").toString
    LangId.save(PipelineQueries.gradedModel(spark), dir)
    val scorer = LangId.localize(LangId.load(spark, dir))
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"pred_lang", $"best_millibits", $"margin_millibits")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = toSet(gs.cls)
    val docs = gs.corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    // grade-1 doc 110 in batch one, grade-2 doc 111 in batch two
    val (first, second) = docs.partition(_._1 <= 110L)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val streamed = scala.collection.mutable.Set.empty[(Long, String, Long, Long)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed ++= toSet(LangId.predictLocal(spark, b.toDF(), scorer)); ()
      }
      .start()
    try {
      Seq(first, second).foreach { c => input.addData(c); q.processAllAvailable() }
      assert(streamed.toSet == batch,
        s"streamed grading diverged from batch: ${streamed.size} vs ${batch.size}")
      val grades = streamed.map(t => t._1 -> t._2).toMap
      assert(grades(110L) == "1" && grades(111L) == "2",
        s"the mid pair must grade across the batch split: $grades")
    } finally q.stop()
  }

  test("streaming CORPUS-GROWTH waves through the JOB's persisted state dirs: per-batch manifests UNION to the one-shot wave's manifest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.PipelineQueries
    // the runIncremental twin (VERDICT r18 #5): waves arrive as
    // micro-batches, each foreachBatch writes its shard files and runs
    // the SAME dir-parameterized incremental job against the SAME lake
    // — every cross-batch effect flows through the lake's persisted
    // states (cur_keys, anchors, windows, pair, allocation), never
    // through session memory. The equality is the strong one: the
    // UNION of the per-batch manifests must equal the manifest of a
    // ONE-SHOT wave (all docs at once, a second lake) — wave
    // boundaries must be invisible in the audit surface, because
    // dedup (min-id election), spans (layered anchors), buckets
    // (frozen pair) and the keep rule are all boundary-free. A batch-2
    // exact duplicate of a batch-1 doc and a batch-2 near-dup of a
    // batch-1 doc pin that the cross-batch legs actually fire.
    def writeShards(docs: Seq[(Long, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("stream_wave")
      docs.groupBy(d => Math.floorDiv(d._1, 16L)).foreach { case (sid, recs) =>
        java.nio.file.Files.write(dir.resolve(f"shard-$sid%05d.warc.gz"),
          PipelineQueries.MultiChain.muxShard(recs))
      }
      dir.toString
    }
    val lidDir = java.nio.file.Files.createTempDirectory("stream_lid").toString
    graft.operators.LangId.save(graft.operators.LangId.train(
      spark.read.parquet(PipelineQueries.LangIdFixture.ensure(spark))
        .filter($"doc_id" % 1000 < 40 && $"doc_id" < 9000)), lidDir)
    val base = (0 until 10).map(i => (i.toLong,
        PipelineQueries.MultiCrawlFixture.doc("en", 411000L + i))) ++
      (0 until 10).map(i => ((100 + i).toLong,
        PipelineQueries.MultiCrawlFixture.doc("fr", 422000L + i)))
    val baseShards = writeShards(base)
    def w1doc(i: Int): String =
      PipelineQueries.MultiCrawlFixture.doc(Seq("en", "fr")(i % 2), 433000L + i)
    val wave1 = (0 until 4).map(i => ((2000 + i).toLong, w1doc(i)))
    val wave2 = Seq(
      // exact duplicate of stream-wave-1 doc 2000 — only the lake's
      // layered cur_keys can kill it in the streamed path
      (3000L, w1doc(0)),
      // near-dup: three lines of wave-1 doc 2001 + two fresh — only
      // the layered anchor state can see the shared runs
      (3001L, (w1doc(1).split("\n").take(3) ++
        Seq(PipelineQueries.MultiCrawlFixture.line("en", 444555L, 0),
          PipelineQueries.MultiCrawlFixture.line("en", 444555L, 1)))
        .mkString("\n")),
      (3002L, PipelineQueries.MultiCrawlFixture.doc("fr", 455000L)))
    // the STREAMED lake: base build, then one runIncremental per batch
    val lakeA = java.nio.file.Files.createTempDirectory("stream_lakeA").toString
    CorpusBuildJob.run(spark, baseShards, lakeA, lidDir)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // collect is the control plane (shard-file writing), the same
        // bounded move the job's own spec makes; the incremental pass
        // itself runs distributed inside runIncremental
        val docs = b.toDF().select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        CorpusBuildJob.runIncremental(spark, writeShards(docs), lakeA,
          lidDir, f"w$batchId")
        ()
      }
      .start()
    try {
      Seq(wave1, wave2).foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    // the ONE-SHOT lake: same base, both waves as a single batch
    val lakeB = java.nio.file.Files.createTempDirectory("stream_lakeB").toString
    CorpusBuildJob.run(spark, baseShards, lakeB, lidDir)
    CorpusBuildJob.runIncremental(spark, writeShards(wave1 ++ wave2),
      lakeB, lidDir, "oneShot")
    val manCols = Seq("doc_id", "pred_lang", "bucket", "avg_millibits",
      "dup_permille", "contaminated", "keep")
    def manSet(df: org.apache.spark.sql.DataFrame) =
      df.select(manCols.map(col): _*).collect().map(_.toSeq).toSet
    val streamedMan = spark.read.parquet(s"$lakeA/waves/w0/manifest")
      .unionByName(spark.read.parquet(s"$lakeA/waves/w1/manifest"))
    val streamed = manSet(streamedMan)
    val oneShot = manSet(spark.read.parquet(s"$lakeB/waves/oneShot/manifest"))
    // the planted cross-batch effects fired in-stream
    val byId = streamed.map(r => r.head.asInstanceOf[Long] -> r).toMap
    assert(!byId.contains(3000L), "the cross-batch duplicate must die")
    val near = spark.read.parquet(s"$lakeA/waves/w1/manifest")
      .filter($"doc_id" === 3001L).collect().head
    assert(near.getAs[Long]("dup_permille") > 300L
      && near.getAs[Long]("keep") == 0L, near.toString)
    // the per-batch manifests are AS-OF snapshots: they equal the
    // one-shot audit everywhere EXCEPT docs a LATER batch retro-touched
    // (here 2001 — the near-dup's source: its duplication exists only
    // once 3001 arrives, and the streamed w0 manifest predates that).
    // The retroactive truth lives in the later wave's SPANS state (the
    // documented contract: the span table carries retro-touched OLD
    // docs), so the difference must be exactly that doc...
    val diff = (streamed -- oneShot) ++ (oneShot -- streamed)
    assert(diff.map(_.head.asInstanceOf[Long]) == Set(2001L),
      s"only the retro-touched source may differ as-of: $diff")
    // ...and FOLDING THE LAYERED SPAN STATE BACK IN reproduces the
    // one-shot audit bit-for-bit: recompute permille from the union of
    // wave span tables over the layered corpus, re-derive keep through
    // the same shared rule (one copy — MultiChain.keepManifest)
    val allSpans = graft.operators.SubstrDedup.mergeSpans(
      spark.read.parquet(s"$lakeA/waves/w0/spans")
        .unionByName(spark.read.parquet(s"$lakeA/waves/w1/spans")))
    val layeredCur = Seq(s"$lakeA/cur", s"$lakeA/waves/w0/cur",
        s"$lakeA/waves/w1/cur")
      .map(spark.read.parquet(_)).reduce(_.unionByName(_))
    val refreshed = PipelineQueries.MultiChain.keepManifest(
      streamedMan.select($"doc_id", $"pred_lang".as("lang"),
        $"avg_millibits", $"bucket"),
      PipelineQueries.MultiChain.dupPermille(layeredCur, allSpans),
      Some(streamedMan.filter($"contaminated" === 1L).select($"doc_id")))
    assert(manSet(refreshed) == oneShot,
      "the layered span state must reproduce the one-shot audit exactly")
  }
}
