package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The reference is batch-only (weekly EventBridge trigger); streaming is
  * a north-star extension: the same hourly aggregation as the batch query
  * q16, expressed as an incremental watermarked stream, plus stateful
  * sessionization with flatMapGroupsWithState. File-source streams make
  * this testable against the static parquet (Trigger.AvailableNow
  * semantics via processAllAvailable in specs).
  *
  * Scale: watermark bounds state; the windowed agg shuffles on
  * (window, event_type) exactly like the batch plan; session state is
  * per-user and evicted on timeout.
  */
object EventStream {

  /** Parquet-on-disk schema of events (ts is timestamp[us] with no UTC
    * flag in the files → TIMESTAMP_NTZ on read).
    *
    * Era support matrix (deliberately ASYMMETRIC): the BATCH loaders
    * (`Tables.events`/`eventsRange`) normalize both the legacy int64-ns
    * era and today's timestamp[us]/NTZ era; the STREAMING source supports
    * the µs/NTZ era only — streams require an explicit schema up front,
    * and carrying a second schema for fixtures that no generator has
    * produced since the ns era would double every streaming test matrix
    * for no live data. Feeding ns-era files here fails fast on schema
    * mismatch; route them through the batch loader instead.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files,
    * normalized to the same session-zone (UTC) TimestampType the batch
    * loader `Tables.events` produces.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", col("ts").cast(TimestampType))

  /** Watermarked hourly tumbling-window aggregation (streaming analog of
    * batch query q16_events_hourly).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"), col("approx_users"))

  /** Watermarked HOPPING-window aggregation (streaming twin of batch
    * q108): 1-hour windows every 15 minutes — the window() generator
    * fans each event into its 4 windows map-side exactly as in batch,
    * then the windowed agg is ordinary watermark-evicted state. Run in
    * complete mode for full-history parity with the batch plan.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_events"), col("sum_value"))

  /** Watermarked per-window VALUE QUANTILES in append mode — the
    * streaming percentile path at 100 TB: each (hour window, event_type)
    * holds ONE constant-size KLL sketch as aggregation state (exact
    * streaming percentiles would need the window's full value multiset
    * in the state store), and the row emits once the watermark closes
    * the window. Values enter as centi-units (×100 longs) to keep the
    * sketch in exact integer arithmetic. Merge order across
    * micro-batches is nondeterministic, so the certified per-sketch
    * `err_bound` column — valid under EVERY merge order — is the
    * consumer contract, exactly as in the batch q126 row.
    */
  def windowedQuantiles(events: DataFrame,
                        permilles: Seq[Int] = Seq(500, 900)): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.KllAgg(
        (col("value") * 100).cast("long"), 64, permilles).as("qs"))
      .select(
        (unix_micros(col("window.start")).as("win_start_us") +:
          col("event_type") +:
          col("qs.n").as("n") +:
          col("qs.err_bound").as("err_bound") +:
          permilles.map(p => col(s"qs.q_$p").as(s"q_$p"))): _*)

  /** Exact-distinct variant of [[hourlyAgg]] — the streaming twin of batch
    * q16 (countDistinct). COUNT(DISTINCT) is unsupported inside streaming
    * aggregations, so distinct users are computed exactly as
    * `size(collect_set(user_id))`: per-(window,type) state bounded by that
    * window's user cardinality, fine at hourly granularity. Run in
    * COMPLETE output mode for full-history parity with the batch plan —
    * append mode holds back windows the watermark hasn't closed.
    */
  def hourlyAggExact(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        size(collect_set(col("user_id"))).cast("long").as("n_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"), col("n_users"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Long, first_ts: java.sql.Timestamp,
                     last_ts: java.sql.Timestamp, total_value: Double)
  case class SessionState(n: Long, first: Long, last: Long, total: Double)

  /** Streaming exact dedup: drops events whose `event_id` was already
    * seen within the watermark horizon — the streaming analog of the
    * batch exactDedup operator; state is bounded by the watermark.
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup — the streaming twin of the batch
    * fingerprint-dedup family (q35's md5-of-normalized-text fingerprint
    * keyed like q20's exact dedup): each event's payload is fingerprinted
    * with the SAME deterministic normalization as the batch path, and
    * rows whose fingerprint was already seen within the watermark horizon
    * are dropped. State is one fingerprint per retained row, bounded and
    * evicted by the watermark — within the horizon the kept set is
    * EXACTLY the batch `dropDuplicates(fp)` answer (StreamingSpec pins
    * the equality across chunked + re-delivered micro-batches); content
    * duplicates farther apart than the horizon are the documented trade
    * for bounded state at 100 TB/day.
    */
  def dedupByFingerprint(events: DataFrame, contentCol: String = "props",
                         watermark: String = "1 hour",
                         unicode: Boolean = false,
                         normalize: Boolean = false): DataFrame = {
    // normalize=true NFC-normalizes the payload before fingerprinting —
    // the batch tiers' flag in its streaming twin (flag parity, pinned
    // by StreamingSpec): an NFD re-encoding of an already-seen payload
    // has a distinct raw fingerprint and would sail past the dedup state
    val c = if (normalize) graft.functions.NfcNormalize(col(contentCol))
            else col(contentCol)
    events
      // unicode=true keys on the codepoint-class token fingerprint: the
      // ASCII-normalized key collapses ALL pure-CJK payloads to md5("")
      // and would drop every CJK event after the first as a "duplicate"
      // (the q181 trap, streaming edition — StreamingSpec pins both modes)
      .withColumn("fp",
        if (unicode) graft.functions.TextFns.fingerprintUni(c)
        else graft.functions.TextFns.fingerprint(c))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Stream-STATIC enrichment join: each micro-batch joins the event
    * stream against a static dimension (user attributes, feature tables,
    * allow-lists). Unlike stream-stream joins this needs no watermark and
    * keeps NO join state — the static side is just re-joined per batch —
    * and broadcasting it keeps the stream side shuffle-free, which is the
    * plan you want when the stream is 100 TB/day and the dimension is
    * megabytes. `left_outer` (stream side left) is the other supported
    * shape for optional attributes; stateless either way.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    joinType: String = "inner"): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), joinType)

  /** Watermarked stream-stream INTERVAL join (click→purchase attribution):
    * each purchase joins the same user's clicks in the preceding
    * `horizonMinutes`. Both sides carry watermarks and the join condition
    * bounds event time on both ends, so Spark can size state and evict —
    * the requirements for stream-stream joins to be unbounded-safe. At
    * scale this shuffles both streams once on user_id and keeps
    * O(horizon × rate) state per key.
    */
  def attributionJoin(events: DataFrame, horizonMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** LEFT OUTER variant of [[attributionJoin]]: every purchase emits, with
    * null click columns when no click preceded it in the horizon. Outer
    * stream-stream joins are strictly harder than inner: the null row for
    * an unmatched purchase can only be emitted once the WATERMARK proves no
    * matching click can still arrive, so results trail the inner join by
    * the watermark delay — state size and eviction are identical.
    */
  def attributionJoinOuter(events: DataFrame, horizonMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** LEFT SEMI variant of [[attributionJoin]]: purchases that HAD at
    * least one click in the horizon — each emitted ONCE no matter how
    * many clicks matched (the inner join would fan out per click, and
    * deduping its output downstream needs a second stateful stage). Semi
    * is also cheaper than inner at scale: the click side's rows are never
    * materialized into results, only probed, so output volume is bounded
    * by the purchase rate. State sizing/eviction rules are identical to
    * the inner join (watermarks + time-bounded condition on both sides).
    */
  def attributionSemi(events: DataFrame, horizonMinutes: Int = 30): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      "left_semi")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("value"))
  }

  /** Exactly-once file sink for a non-transactional target: foreachBatch is
    * only at-least-once — a crash after the sink write but before the
    * checkpoint commit redelivers the SAME (batchId, data) on restart. The
    * write is made idempotent by keying it on batchId: each batch lands in
    * its own `batch_id=` partition under dynamic partition overwrite
    * (GraftSession default), so a redelivered batch overwrites its own
    * files instead of appending duplicates. This is the standard
    * exactly-once recipe for file/key-value sinks; `onBatch` is a test
    * hook that runs AFTER the write and BEFORE the commit (the crash
    * window this construction exists to survive).
    */
  def exactlyOnceFileSink(df: DataFrame, outDir: String, checkpoint: String,
                          onBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
        onBatch(id)
      }
      .start()

  /** Session aggregation with the built-in event-time session window:
    * per (user, session) event counts/value totals. The zero-custom-code
    * path — prefer this when the output is plain aggregates.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Custom-state sessionization via flatMapGroupsWithState: per-user
    * session closed after `gapMinutes` of EVENT-TIME inactivity (timeout
    * fires when the watermark passes last_event + gap — deterministic,
    * replayable, unlike processing-time timeouts). Emits the closed
    * session row. Use over sessionWindowAgg when the state transition is
    * genuinely custom (e.g. carrying first/last event payloads).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n,
              new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last), s.total))
          } else {
            val evs = batch.toSeq
            if (evs.nonEmpty) {
              val prev = state.getOption.getOrElse(SessionState(0, Long.MaxValue, Long.MinValue, 0.0))
              val next = SessionState(
                prev.n + evs.size,
                math.min(prev.first, evs.map(_.ts.getTime).min),
                math.max(prev.last, evs.map(_.ts.getTime).max),
                prev.total + evs.map(_.value).sum)
              state.update(next)
              state.setTimeoutTimestamp(next.last + gapMinutes * 60000L)
            }
            Iterator.empty
          }
        })
  }

  /** Exact event-time MICROS of a Timestamp — `getTime` alone is millis
    * and silently reorders sub-millisecond neighbors against the batch
    * kernels' unix_micros ordering; getNanos carries the rest.
    */
  private def microsOf(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  case class AsOfState(lastClickT: Long, lastClickId: Long)
  case class AsOfRow(event_id: Long, user_id: Long, prior_click_id: java.lang.Long)

  /** STREAMING AS-OF attribution — the batch as-of join (q34 composed /
    * q162 native exec) as per-user flatMapGroupsWithState: state is the
    * user's latest click (two longs), and every error arriving emits ONE
    * append-mode row carrying the most recent prior click id (null when
    * none yet). Within a micro-batch events replay in (micros, kind,
    * event_id) order with clicks at kind 0 — the exact tie rule of the
    * batch window (a click at the same micros as an error matches it,
    * rt <= lt inclusive). Output is bounded by the ERROR rate — no
    * per-click fan-out, no join state horizon: where a stream-stream
    * join would buffer both sides within a watermark, the as-of shape
    * needs only the last click per user, ever. In-order delivery
    * reproduces the batch join exactly (StreamingSpec pins equality
    * over chunked delivery); the late-data policy is [[ewmaPerUser]]'s:
    * a click older than the stored one is dropped (monotone guard), an
    * error is attributed against the state AS OF its arrival — stale
    * attribution, never a crash, and production bounds reordering with
    * an upstream watermark buffer.
    */
  def asofPerUser(events: Dataset[Event]): Dataset[AsOfRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[AsOfState]) => {
          var st = state.getOption.getOrElse(AsOfState(Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfRow]
          batch.toSeq
            .sortBy(e => (microsOf(e.ts), if (e.event_type == "click") 0L else 1L, e.event_id))
            .foreach { e =>
              val t = microsOf(e.ts)
              e.event_type match {
                case "click" =>
                  if (t > st.lastClickT ||
                    (t == st.lastClickT && e.event_id > st.lastClickId))
                    st = AsOfState(t, e.event_id)
                case "error" =>
                  out += AsOfRow(e.event_id, userId,
                    if (st.lastClickId == Long.MinValue) null
                    else java.lang.Long.valueOf(st.lastClickId))
                case _ => ()
              }
            }
          state.update(st)
          out.iterator
        })
  }

  case class EwmaState(lastT: Long, lastI: Long, ewma: Long, n: Long)
  case class EwmaRow(user_id: Long, n_events: Long, ewma_cents: Long)

  /** STREAMING EWMA — the order-dependent sequential kernel (batch twin:
    * q144) as per-user mapGroupsWithState: e_0 = x_0, e_t = (x_t +
    * 3·e_prev) div 4 on cent-scaled values. Within a micro-batch events
    * sort by (ts, event_id) — the same total order the batch fold uses —
    * and the state carries (last applied key, ewma, n) across batches,
    * so in-order delivery reproduces the batch fold EXACTLY (integer
    * arithmetic end to end; StreamingSpec pins equality across chunked
    * delivery). LATE-DATA POLICY: an event at-or-before the last applied
    * (ts, event_id) is DROPPED — a sequential recurrence cannot be
    * retro-folded without replaying the suffix; production would bound
    * reordering with a watermark buffer upstream, and the drop (not a
    * wrong fold) is the documented failure mode. Update-mode output:
    * each batch re-emits the touched users' current EWMA. State is
    * O(1) per user — three longs — the smallest stateful-kernel shape.
    */
  def ewmaPerUser(events: Dataset[Event]): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[EwmaState]) => {
          var st = state.getOption.getOrElse(EwmaState(Long.MinValue, Long.MinValue, -1L, 0L))
          batch.toSeq.sortBy(e => (microsOf(e.ts), e.event_id)).foreach { e =>
            val t = microsOf(e.ts)
            val inOrder = t > st.lastT || (t == st.lastT && e.event_id > st.lastI)
            if (inOrder) {
              val c = math.round(e.value * 100)
              val next = if (st.ewma < 0) c else (c + 3 * st.ewma) / 4
              st = EwmaState(t, e.event_id, next, st.n + 1)
            }
          }
          state.update(st)
          EwmaRow(userId, st.n, st.ewma)
        })
  }

  case class FunnelState(vTs: Long, cTs: Long, pTs: Long)
  case class FunnelRow(user_id: Long, stage: Long, v_ts: java.lang.Long,
                       c_ts: java.lang.Long, p_ts: java.lang.Long)

  /** STREAMING FUNNEL — q152's ordered-sequence detection as per-user
    * mapGroupsWithState: track the earliest view, the first click
    * strictly after it, the first purchase strictly after that, as three
    * longs of state per user. Within a micro-batch events replay in
    * (ts, event_id) order; under IN-ORDER delivery across batches the
    * final state equals the batch chain exactly (StreamingSpec pins it
    * over chunked delivery). Out-of-order arrivals carry the same
    * documented contract as [[ewmaPerUser]]: a chain anchored on an
    * earlier slot cannot be retro-derived from three longs once later
    * slots are filled (an early-arriving view would invalidate the
    * click/purchase candidates that preceded it), so production bounds
    * reordering upstream with a watermark buffer; the failure mode is a
    * stale chain, never a crash.
    */
  def funnelPerUser(events: Dataset[Event]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val U = Long.MaxValue // unset sentinel: min() folds naturally
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(FunnelState(U, U, U))
          batch.toSeq.sortBy(e => (microsOf(e.ts), e.event_id)).foreach { e =>
            val t = microsOf(e.ts)
            e.event_type match {
              case "view" if t < st.vTs => st = FunnelState(t, st.cTs, st.pTs)
              case "click" if st.vTs != U && t > st.vTs && t < st.cTs =>
                st = FunnelState(st.vTs, t, st.pTs)
              case "purchase" if st.cTs != U && t > st.cTs && t < st.pTs =>
                st = FunnelState(st.vTs, st.cTs, t)
              case _ => ()
            }
          }
          state.update(st)
          val stage = if (st.pTs != U) 3L else if (st.cTs != U) 2L
            else if (st.vTs != U) 1L else 0L
          def opt(v: Long): java.lang.Long = if (v == U) null else java.lang.Long.valueOf(v)
          FunnelRow(userId, stage, opt(st.vTs), opt(st.cTs), opt(st.pTs))
        })
  }

  /** Streaming sketch-distinct: the 100 TB streaming COUNT DISTINCT.
    * Both sketches run as a complete-mode streaming aggregation — the
    * HLL (approximate, constant state per group) and the paged bitmap
    * (exact, ~1 bit per distinct id of state). Both merge associatively
    * and idempotently (register max / bitwise OR), so the streaming
    * result is EQUAL to the batch computation no matter how the input is
    * chunked into micro-batches — StreamingSpec pins that equality
    * across a two-chunk delivery. countDistinct can't do this at all:
    * it's unsupported inside streaming aggregations (Expand needs the
    * full history), which is exactly why deployments keep a mergeable
    * sketch as streaming state.
    */
  def sketchDistinct(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("approx_users"),
        graft.functions.BitmapDistinct(col("user_id")).as("exact_users"))

  /** Streaming heavy hitters: a Space-Saving summary per group as
    * accumulating complete-mode aggregation state — O(k) per group
    * where exact per-key counting would hold the full (unbounded) key
    * space as state. Completes the streaming sketch family (KLL
    * quantiles, HLL/bitmap distinct): the emitted struct carries its
    * own proof — per-key [lb, ub] count bounds and the containment
    * floor — which is what the spec checks against exact counts across
    * chunked micro-batch delivery.
    */
  def heavyHitters(events: DataFrame, k: Int = 8): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(graft.functions.SpaceSavingAgg(col("user_id").cast("string"), k).as("hh"))
}
