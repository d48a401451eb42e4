package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties the queries are
  * designed around must survive refactors — filters reaching the parquet
  * scan, dimensions broadcast, codegen'd scoring, no stray cartesian
  * products.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicates and projection are pushed to the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(500))
    assert(p.contains("In(l_returnflag"), "IN filter must reach the scan")
    // pruned read schema: only the referenced columns
    assert(!p.contains("l_extendedprice"), "untouched columns must be pruned from the scan")
  }

  test("q111: the time-range predicate reaches the parquet scan in the file's native representation") {
    import org.apache.spark.sql.types._
    val p = plan("q111_pushdown_time_range")
    // the sargable loader filters the RAW column before normalizing, so
    // the range lands in PushedFilters; the normalized view's timestamp
    // arithmetic could never push it. The pushed literal's rendering
    // depends on the fixture era — int64 nanos (nanosAsLong) vs
    // timestamp[us]/NTZ — so pin the shape the data on disk dictates.
    Tables(spark, sf, "events").schema("ts").dataType match {
      case LongType =>
        assert(p.contains("GreaterThanOrEqual(ts,1704844800000000000)"), p.take(800))
        assert(p.contains("LessThan(ts,1705708800000000000)"), p.take(800))
      case TimestampNTZType =>
        assert(p.contains("GreaterThanOrEqual(ts,2024-01-10T00:00"), p.take(800))
        assert(p.contains("LessThan(ts,2024-01-20T00:00"), p.take(800))
      case other => fail(s"unexpected events.ts parquet type $other — extend Tables.eventsRange and this pin")
    }
  }

  test("q111 ns era: int64-nanos fixtures push the range as exact nanosecond bounds") {
    // today's testdata ships timestamp[us], so the LongType branch of the
    // sargable loader would go untested — synthesize the ns-era shape
    // (a plain int64 ts column, exactly what nanosAsLong-era files look
    // like to the reader) and pin its pushed rendering too
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ns-era").toString
    Seq((1L, 1704844800000000000L), (2L, 1705000000000000000L), (3L, 1706000000000000000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val df = Tables.eventsRange(spark, tmp, 1704844800000000L, 1705708800000000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(ts,1704844800000000000)"), p.take(800))
    assert(p.contains("LessThan(ts,1705708800000000000)"), p.take(800))
    assert(df.count() == 2, "range must keep exactly the two in-window rows")
  }

  test("q05: every dimension join is a broadcast hash join, no sort-merge") {
    val p = plan("q05_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "customer/nation/region hops must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q24: pairwise scoring uses the codegen'd array_dot, not interpreted HOFs") {
    val p = plan("q24_embed_neardup_pairs")
    assert(p.contains("array_dot"), "custom ArrayDot expression must be in the plan")
    // the per-PAIR score must be a single dot (normalization happens once
    // per side) — an aggregate(zip_with(...)) in the join condition would
    // mean the interpreted fallback crept back in
    val joinCond = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinCond.contains("array_dot") && !joinCond.contains("aggregate("),
      s"join condition must score via array_dot only: $joinCond")
  }

  test("q61: ref_date predicate prunes lake partitions at planning time") {
    val df = SparkEntry.queries("q61_cnpj_lake_star")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // every one of the 3 scans carries the ref_date partition filter —
    // planning-time pruning, not a runtime row filter. (inputFiles can't
    // pin this: for path-based reads it reports the UNPRUNED listing.)
    val scans = p.linesIterator.filter(_.contains("PartitionFilters:")).toSeq
    assert(scans.size == 3, p.take(800))
    assert(scans.forall(_.contains("= 20230601")), scans.mkString("\n"))
    // and no scan reads the newer snapshot
    assert(!p.contains("20230701"))
    // star shape: municipios broadcast
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q178: bench-scale lake star — pruning holds, municipios broadcasts, empresas edge is threshold-driven (no forced broadcast)") {
    val df = SparkEntry.queries("q178_cnpj_lake_scale")(spark, sf)
    // SCALE-HONESTY pin first, on the analyzed plan: the only broadcast
    // HINT in the query is the municipios one. The empresas side is a
    // 53M-row FACT in the real dataset (SURVEY §2 J3) — a hard-coded
    // broadcast(empresas) would be an OOM pin at 100×, so its join
    // strategy must stay threshold/AQE-driven.
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1, s"expected exactly one broadcast hint (municipios), got ${hints.size}")
    // the analyzed plan prints no file paths — identify the hinted
    // subtree by its output schema: (codigo, desc) is municipios;
    // (cap_soc, porte) would be the empresas fact
    val hinted = hints.head.child.output.map(_.name).toSet
    assert(hinted == Set("codigo", "desc"),
      s"the only hint must cover the municipios dimension, got columns $hinted")
    // EXECUTE: AQE finalizes the physical plan at runtime, and the claim
    // is that the star shape survives adaptive re-planning at the volume
    // where it matters, not just in the initial plan
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.filter(_.contains("PartitionFilters:")).toSeq
    assert(scans.size == 3, s"expected 3 pruned scans:\n${p.take(800)}")
    assert(scans.forall(_.contains("= 20230601")), scans.mkString("\n"))
    // neither neighbor snapshot is read
    assert(!p.contains("20230401") && !p.contains("20230801"))
    // at THIS lake size the threshold picks broadcast for the pruned 20k
    // empresas scan too — both joins end up BHJ, chosen not forced
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "municipios must broadcast; empresas should be threshold-picked BHJ at 20k rows")
    assert(!p.contains("SortMergeJoin"),
      "at this size the threshold should pick BHJ on the empresas edge")
  }

  test("q66: range join runs as a hash join on bin ids — no nested loop against the fact table") {
    val p = plan("q66_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.linesIterator.filter(l => l.contains("Join") || l.contains("Cartesian")).mkString("\n"))
    assert(p.contains("Join"), "the containment must still be a join")
  }

  test("q95: LATERAL ORDER BY/LIMIT decorrelates to a window group-limit, never a per-row nested loop") {
    val p = plan("q95_lateral_topn")
    // DecorrelateInnerQuery + InferWindowGroupLimit: the correlated LIMIT 2
    // becomes partial+final WindowGroupLimit (distributed top-k) feeding a
    // row_number window, joined back with one hash join
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q72: bucketed join key never re-shuffles — the exchange was paid at layout time") {
    val p = plan("q72_bucketed_join")
    assert(p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("hashpartitioning(l_orderkey") && !p.contains("hashpartitioning(o_orderkey"),
      p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("Bucketed: true"), "scans must report the bucketed layout")
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final HashAggregate around the exchange")
  }

  test("q37: split assignment is a pure scalar scan — no shuffle except the sort") {
    val p = plan("q37_hash_split")
    assert(!p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("HashAggregate"), "split must not join or aggregate")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      "scan must be pruned to doc_id only (text never read)")
  }

  test("q38: bigram aggregation is partial before the shuffle; scalar side stays pruned") {
    val p = plan("q38_repetition_stats")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-doc bigram counts must map-side combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("q42: sequence packing is one window pass — no join, single sort lineage") {
    val p = plan("q42_sequence_pack")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(400))
    assert(!p.contains("Join"), "packing must not join")
  }

  test("q45: stratified sample is a pure filter with a pruned scan") {
    val p = plan("q45_stratified_sample")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "sampling must not join or aggregate")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "scan must be pruned to doc_id+lang (text never read)")
  }

  test("q52: benchmark shingle set broadcasts; per-doc counts partial-aggregate") {
    val p = plan("q52_decontamination")
    assert(p.contains("BroadcastHashJoin"),
      "the (tiny) benchmark shingle set must be the broadcast build side")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "distinct-shingle counts must combine before the shuffle")
  }

  test("q53: PII redaction is a pure scalar scan — no join, no aggregate") {
    val p = plan("q53_pii_redact")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "redaction must be a single codegen'd pass")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must read only doc_id+text")
  }

  test("q54: rep table broadcasts; repetition adds no extra shuffle") {
    val p = plan("q54_upsample_balance")
    assert(p.contains("BroadcastHashJoin"), "per-language rep factors must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"), // the 1-row n_max cross join may plan as BNLJ
      s"corpus must not shuffle for the join:\n${p.take(800)}")
  }

  test("q39: victim removal is a broadcast left-anti join") {
    val p = plan("q39_curation_manifest")
    assert(p.contains("LeftAnti"), "victim removal must be an anti join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the tiny victim list must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q76: inverted-index candidate join never degenerates to all-pairs") {
    val p = plan("q76_tfidf_cosine")
    assert(!p.contains("CartesianProduct"), "token self-join degenerated to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate join lost its equi-key")
  }

  test("q84: the candidate set broadcasts for the exact recount") {
    // AQE picks the broadcast at runtime — pin the FINAL plan
    val df = SparkEntry.queries("q84_heavy_hitters")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "candidates must broadcast, not shuffle the token stream")
    assert(!p.contains("SortMergeJoin"), "the token stream must never key-shuffle for the join")
  }

  test("q83: wedge closing is an equi hash join; only the 1-row total cross-joins") {
    val p = plan("q83_triangle_count")
    assert(!p.contains("CartesianProduct"), "wedge join degenerated to a cartesian")
    // the single BroadcastNestedLoopJoin is the deliberate 1-row x 1-row
    // final (n_edges x n_triangles) combine — anything more is a bug
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, "unexpected nested-loop joins")
  }

  test("q126: sketch aggregation is partial (map-side sketches) before the shuffle") {
    val p = plan("q126_kll_grouped")
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final around the exchange proves the shuffle carries SKETCHES,
    // not rows — the whole point of the aggregate at 100 TB
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expect partial + final ObjectHashAggregate:\n${p.take(800)}")
    assert(p.contains("kll_quantiles"), "the KllAgg expression must be in the plan")
  }

  test("q87: bloom prefilter sits in the scan stage before the exact semi join") {
    val p = plan("q87_bloom_semijoin")
    assert(p.contains("might_contain"), "bloom prefilter missing")
    assert(p.contains("LeftSemi"), "exact semi join must remain after the prefilter")
  }

  test("q213: the benchmark token-window set broadcasts; the train corpus is never exchanged before detection") {
    import org.apache.spark.sql.functions.col
    // the tier's 100 TB contract: train-side window rows filter
    // MAP-SIDE against the broadcast bench set — the only corpus-scale
    // exchange is the doc-keyed island window over the (subset-bounded)
    // hit positions; the other shuffle is the tiny bench-side distinct
    val fx = spark.read.parquet(
      graft.queries.DedupQueries.TokenFixture.ensure(spark))
    val df = graft.operators.TokenDecontam.contaminationTokenSpans(
      fx.filter(col("doc_id") < 900L), fx.filter(col("doc_id") >= 900L))
    df.collect() // settle AQE so the final plan is the judged one
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"bench windows must broadcast into a semi join:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2,
      s"expected at most (bench distinct + island window) exchanges, got $shuffles:\n${p.take(1200)}")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at RUNTIME") {
    import spark.implicits._
    // The 100 TB star-join enabler beyond q61's STATIC pruning: the fact
    // side's partition filter is only knowable after filtering the
    // dimension, so Catalyst injects a dynamicpruning subquery into the
    // fact scan (reusing the join's broadcast) — without it, a date-dim
    // filter still scans every fact partition. Pinned on a real
    // partitioned parquet table + the executed plan.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      spark.range(1000)
        .select(($"id" % 10).as("pk"), $"id".as("v"))
        .write.partitionBy("pk").mode("overwrite").parquet(dir)
      val fact = spark.read.parquet(dir)
      import org.apache.spark.sql.functions.when
      val dim = spark.range(10).select($"id".as("dk"),
        when($"id" < 2, "keep").otherwise("drop").as("flag"))
      val joined = fact.join(dim, $"pk" === $"dk").filter($"flag" === "keep")
      assert(joined.collect().length == 200) // 2 of 10 partitions survive
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"fact scan must carry a dynamicpruning partition filter:\n${p.take(1000)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q214: the cutoff table broadcasts into the tag join — the corpus-scale pass never sort-merges") {
    // the CCNet-bucketing 100 TB contract: after cutoff estimation, the
    // tag is a broadcast join + a map-side CASE; English being half the
    // corpus must never funnel through a SortMergeJoin on lang (a
    // 5-key skewed shuffle) — the |languages|-row cut table ships to
    // the scan instead
    val df = SparkEntry.queries("q214_ccnet_buckets")(spark, sf)
    df.collect() // settle AQE so the final plan is the judged one
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"),
      s"the tag path must not sort-merge on lang:\n${p.take(1000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the cut table must broadcast:\n${p.take(800)}")
  }

  test("q216: line cleaning is one scalar pass — no join, no aggregation, only the output sort exchanges") {
    val df = SparkEntry.queries("q216_c4_line_clean")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"line surgery must stay per-row:\n${p.take(800)}")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"only the deterministic ORDER BY may exchange, got $exchanges:\n${p.take(1000)}")
  }
}
