package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants. The registries are Seqs concatenated into
  * Maps, so a duplicate query name would SILENTLY shadow an earlier query
  * and drop its correctness-gate row — this spec makes that (and a
  * drifting no-oracle set) a loud failure instead.
  */
class ContractSpec extends AnyFunSuite {

  /** Queries intentionally without a DuckDB oracle, each with a reason
    * documented at its definition site (approximate by design, or not
    * SQL-expressible). Growing this set should be a conscious act.
    */
  private val noOracle = Set(
    "q26_simsearch_lsh",       // approximate (SRP-LSH); recall spec-pinned
    "q31_simsearch_ivf",       // approximate (IVF probing); recall spec-pinned
    "q44_compression_quality", // zlib has no SQL analog; determinism spec
    "q57_jpeg_decode",         // lossy DCT: no exact SQL oracle; JpegSpec PSNR/determinism
    "q58_video_frames",        // AVI/MJPEG: lossy frames; container byte-lossless spec
    "q59_adpcm_decode",        // lossy integer codec; AdpcmSpec SNR/determinism/drift
    "q75_hll_distinct",        // sketch estimate; DuckDB's approx_distinct is a different sketch — SketchSpec error/determinism
    "q82_phash_neardup",       // DCT perceptual hash: thresholded DCT isn't SQL-expressible — PhashSpec invariance/recall
    "q101_space_saving",       // bounds depend on partition layout; AnalyticsSpec pins sandwich/containment/exactness
    "q109_quantile_summary",   // estimates depend on partition layout; AnalyticsSpec pins error bound/exactness
    "q124_kll_quantiles",      // sketch estimates depend on partition layout; KllSpec pins the certified bound
    "q126_kll_grouped",        // grouped-sketch estimates depend on merge order; KllSpec pins the emitted bound
    "q131_kll_rollup",         // sketch-store rollup likewise; KllSpec pins round-trip + rollup equality
    "q133_hll_rollup",         // HLL register states depend on nothing but values, but DuckDB's approx sketch differs (q75 rule); SketchSpec pins rollup == direct
    "q136_ivfpq_topk",         // approximate by list pruning (q31 rule); PqSearchSpec pins recall floors + nprobe monotonicity
    "q139_ivf_sq8_topk",       // approximate by list pruning (q31 rule); IvfSearchSpec pins certified error bound + recall >= 0.9
    "q146_bpe_learn",          // iterative argmax has no SQL oracle; BpeSpec pins learner == sequential reference + corpus compression
    "q154_audio_spectral",     // float DSP (FFT) is not SQL-expressible; DspSpec pins FFT==DFT, Parseval, exact planted-tone recovery
    "q185_decontam_ivf",       // approximate by list pruning (q26/q31 rule); IvfSearchSpec pins one-sidedness vs q184 + dropped-set recall >= 0.8
    "q205_ivf_signed_topk")    // approximate by list pruning (q26/q31 rule); IvfSearchSpec pins full-probe == binary tier + recall floor + nprobe monotonicity

  test("query names are unique (no silent map shadowing)") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every query is oracle-checked except the documented no-oracle set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without a query: ${(o -- q).mkString(", ")}")
    assert((q -- o) == noOracle,
      s"undocumented no-oracle queries: ${(q -- o -- noOracle).mkString(", ")}; " +
        s"stale noOracle entries: ${(noOracle -- (q -- o)).mkString(", ")}")
  }

  test("every oracle aliases result columns deterministically (ORDER BY present)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"),
        s"$name oracle lacks a deterministic ORDER BY")
    }
  }

  test("compact bench keys (bare query numbers) stay unique across the registry") {
    // Bench.shortKey strips "qNN_suffix" to "NN"; two queries sharing a
    // number would silently merge into one compact-line entry and the
    // driver's BENCH artifact would drop a row
    val keys = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_').stripPrefix("q"))
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate compact bench keys: ${dups.mkString(", ")}")
  }

  // ---- BenchFormat: the tail-surviving compact artifact ----------------
  // The driver parses the LAST stdout line from a 2000-char tail (NOTES
  // rule 12). BenchFormat guarantees fit BY CONSTRUCTION (slowest-first
  // greedy fill + omission accounting), so the registry has NO hard row
  // ceiling anymore — these tests pin the guarantees on a 250-row
  // synthetic registry (the prescribed >=200-row model) and on the real
  // one.

  private def parse(line: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  /** Deterministic synthetic registry: values spread across the
    * precision tiers, three errored rows, three >=100 s monsters.
    */
  private def syntheticRows(n: Int): Seq[(String, Double, Seq[Double])] =
    (1 to n).map { i =>
      val base = (i % 97) / 10.0 + (if (i % 31 == 0) 15.0 else 0.0) +
        (if (i % 83 == 0) 150.0 else 0.0)
      val med = if (i % 71 == 0) -1.0 else base + 0.3
      (s"q${i}_synthetic_row", med, Seq(base + 0.3, base + 0.1, base + 0.9))
    }

  test("BenchFormat: a 250-row registry still fits the tail budget, slowest rows survive") {
    val rows = syntheticRows(250)
    val line = BenchFormat.compactLine(rows, "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.TailBudget, s"line ${line.length} chars")
    val j = parse(line)
    val qs = j.get("queries")
    val omitted = j.get("omitted").asInt
    // omitted_max is integer deciseconds like the per-query values
    val omittedMax = j.get("omitted_max").asDouble / 10.0
    assert(qs.size + omitted == 250, "every row is either present or accounted omitted")
    assert(qs.size >= 150, s"only ${qs.size} rows included — budget model broke")
    // per-row MIN semantics in DECISECONDS, and every omitted row is
    // bounded by omitted_max
    val mins = rows.collect { case (k, v, ts) if v >= 0 =>
      BenchFormat.shortKey(k) -> ts.min }.toMap
    val included = scala.jdk.CollectionConverters.IteratorHasAsScala(qs.fieldNames).asScala.toSet
    mins.foreach { case (k, mn) =>
      if (included.contains(k))
        assert(math.abs(qs.get(k).asDouble / 10.0 - mn) <= 0.051,
          s"$k: compact ${qs.get(k).asDouble} ds vs true min $mn s (100 ms rounding)")
      else assert(mn <= omittedMax + 0.051,
        s"omitted $k has min $mn > omitted_max $omittedMax — a regression could hide")
    }
    // included rows are the SLOWEST ones: no omitted min exceeds an included one's tier
    val slowest20 = mins.toSeq.sortBy(-_._2).take(20).map(_._1)
    slowest20.foreach(k => assert(included.contains(k), s"slowest row $k was dropped"))
    // errors are never dropped
    val errs = j.get("errors")
    assert(errs.size == rows.count(_._2 < 0))
  }

  test("BenchFormat: real registry padded to 233 rows fits with ZERO omission (full per-row tail coverage)") {
    // realistic value model, RECALIBRATED late r15 against the round's
    // nine committed runs (n=218: mean 0.49 s, p50 0.32, p90 1.07,
    // max 2.42; 11% of rows >= 1 s): the old uniform 0.1–3.6 s model
    // dated from round 10 and ran ~2 chars/row fatter than any real
    // line ever measured, burning guard headroom on a shape the
    // registry does not have. The model below keeps the real SHAPE
    // with margin on top — 1 row in 13 is a 1.0–3.8 s "monster"
    // (future expensive rows stay anticipated; today's max is 2.42),
    // the rest 0.1–0.9 s — and the padding target moved 218 → 224 → 227 → 233
    // (r17: measured headroom — the realistic model reads 1908 chars at
    // 233 rows vs the 1960 budget; no format change was needed),
    // re-proved in BOTH tests (the sentinel-bearing sibling is the
    // binding one). The line crossed budget at ~211 rows twice, so
    // every capacity step must re-prove the margin here.
    val real = SparkEntry.allQueries.map(_.name)
    val names = real ++ (900 until (900 + (233 - real.size).max(0))).map(i => s"q${i}_headroom")
    val rows = names.zipWithIndex.map { case (n, i) =>
      val v = if (i % 13 == 0) 1.0 + (i % 29) / 10.0 else 0.1 + (i % 9) / 10.0
      (n, v, Seq(v + 0.2, v, v + 0.5))
    }
    val line = BenchFormat.compactLine(rows, "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.TailBudget)
    val j = parse(line)
    assert(j.get("omitted") == null,
      s"${j.get("omitted")} rows omitted at a 233-row realistic model — " +
        "the ds-encoding headroom guarantee broke; shrink the format again")
    assert(j.get("queries").size == rows.size)
    assert(j.get("qv").asText == "min_ds")
  }

  test("BenchFormat: contention sentinel rides the compact line and does not break the zero-omission guarantee") {
    val real = SparkEntry.allQueries.map(_.name)
    val names = real ++ (900 until (900 + (233 - real.size).max(0))).map(i => s"q${i}_headroom")
    val rows = names.zipWithIndex.map { case (n, i) =>
      // the recalibrated value model (see the sibling test) — THIS
      // test is the binding one: it carries the sentinel field
      val v = if (i % 13 == 0) 1.0 + (i % 29) / 10.0 else 0.1 + (i % 9) / 10.0
      (n, v, Seq(v + 0.2, v, v + 0.5))
    }
    val line = BenchFormat.compactLine(rows, "/root/testdata/sf0.1",
      sentinel = Some((0.73, 0.81)), sentinelMid = 1.27)
    assert(line.length <= BenchFormat.TailBudget)
    val j = parse(line)
    // three readings, deciseconds, same encoding as the per-query
    // values: [first, last, max-mid-run]. The third element is what
    // makes the OFFICIAL artifact self-adjudicating against the r14
    // ghost shape (calm boundary pair, contended middle)
    val s = j.get("sentinel_ds")
    assert(s != null && s.size == 3,
      "sentinel_ds must carry (first, last, midMax)")
    assert(s.get(0).asInt == 7 && s.get(1).asInt == 8 && s.get(2).asInt == 13)
    assert(j.get("omitted") == null,
      "the sentinel field must not push the full-registry model into omission " +
        "(absent field == zero, the compact line's accounting contract)")
    // a killed run's snapshot self-describes: last reading still
    // pending, and no mid reading taken yet -> both -1
    val killed = parse(BenchFormat.compactLine(rows.take(3), "sf",
      sentinel = Some((0.73, -1.0))))
    assert(killed.get("sentinel_ds").get(1).asInt == -1)
    assert(killed.get("sentinel_ds").get(2).asInt == -1)
    // absent sentinel -> absent field (synthetic-registry tests unchanged)
    assert(parse(BenchFormat.compactLine(rows.take(3), "sf")).get("sentinel_ds") == null)
  }

  test("BenchFormat: interleaved sentinel series — JSON shape, calm/spiky attribution, pending readings") {
    // format: [[rowsCompleted, seconds], ...] with millisecond precision
    val s = Seq((0, 0.41), (25, 0.398), (50, -1.0))
    assert(BenchFormat.seriesJson(s) == "[[0,0.410],[25,0.398],[50,-1.000]]")
    assert(BenchFormat.seriesJson(Seq.empty) == "[]")
    // a calm series attributes nothing
    val calm = Seq((0, 0.40), (25, 0.43), (50, 0.39), (75, 0.41), (100, 0.40))
    assert(BenchFormat.contendedWindows(calm).isEmpty)
    // ONE mid-run spike (the round-13 co-tenant shape: calm first/last,
    // a wake between) flags exactly the two windows it brackets, merged
    val midSpike = Seq((0, 0.40), (25, 0.41), (50, 1.20), (75, 0.40), (100, 0.41))
    assert(BenchFormat.contendedWindows(midSpike) == Seq((25, 75)),
      "rows 25..75 are bracketed by the spiky reading at 50 on one side")
    // a spiky TAIL (the committed r13 detail's exact signature:
    // first sentinels calm, last reading 2.55) flags only the tail window
    val tailSpike = Seq((0, 0.40), (25, 0.39), (50, 0.41), (75, 2.55))
    assert(BenchFormat.contendedWindows(tailSpike) == Seq((50, 75)))
    // two separated spikes stay two ranges; adjacent ones merge
    val twoSpikes = Seq((0, 0.4), (25, 1.9), (50, 0.4), (75, 0.4), (100, 1.3), (125, 0.4))
    assert(BenchFormat.contendedWindows(twoSpikes) == Seq((0, 50), (75, 125)))
    // pending (-1) readings never spike and never set the baseline; a
    // killed run with < 2 valid readings attributes nothing
    val withPending = Seq((0, 0.40), (25, -1.0), (50, 0.41))
    assert(BenchFormat.contendedWindows(withPending).isEmpty)
    assert(BenchFormat.contendedWindows(Seq((0, 0.4), (25, -1.0))).isEmpty)
    // the factor is a real threshold: 1.9x base stays calm at 2.0
    val nearMiss = Seq((0, 0.40), (25, 0.76), (50, 0.40))
    assert(BenchFormat.contendedWindows(nearMiss).isEmpty)
    assert(BenchFormat.contendedWindows(nearMiss, calmFactor = 1.5) == Seq((0, 50)))
  }

  test("BenchFormat: retry plan + merge accounting (the contention-correcting pass)") {
    // a synthetic 6-row registry: rows 0-2 inside a contended window,
    // rows 3-5 outside; row 1 errored
    val rows = Seq(
      ("q1_a", 2.0, Seq(2.0, 2.1, 2.2)),
      ("q2_b", -1.0, Seq(-1.0, 1.0, 1.0)),
      ("q3_c", 5.0, Seq(5.0, 5.1, 4.9)),
      ("q4_d", 9.0, Seq(9.0, 9.1, 9.2)),
      ("q5_e", 0.3, Seq(0.3, 0.3, 0.3)),
      ("q6_f", 0.2, Seq(0.2, 0.2, 0.2)))
    val windows = Seq((0, 3))
    // slowest-first within the window; the errored row is NEVER planned
    assert(BenchFormat.retryPlan(rows, windows) == Seq(2, 0))
    // the cap bounds the pass and spends it on the slowest rows
    assert(BenchFormat.retryPlan(rows, windows, maxRetries = 1) == Seq(2))
    // no contended windows -> no plan
    assert(BenchFormat.retryPlan(rows, Seq.empty).isEmpty)
    // merge: a calm retry LOWERS the median and concatenates reps
    assert(BenchFormat.mergeRetry(5.0, Seq(5.0, 5.1), 1.4, Seq(1.4, 1.5)) ==
      ((1.4, Seq(5.0, 5.1, 1.4, 1.5))))
    // a slower retry never raises the official number
    assert(BenchFormat.mergeRetry(2.0, Seq(2.0), 3.0, Seq(3.0))._1 == 2.0)
    // an errored original stays errored — a retry must not launder -1
    assert(BenchFormat.mergeRetry(-1.0, Seq(-1.0), 1.0, Seq(1.0))._1 == -1.0)
    // an errored RETRY leaves the original standing
    assert(BenchFormat.mergeRetry(2.0, Seq(2.0), -1.0, Seq(-1.0))._1 == 2.0)
  }

  test("BenchFormat: history-outlier retry trigger (r17 — a 12x spike the calm sentinel bracketing cannot see)") {
    // the r17 official artifact: q01 min 14.1 s vs a 1.17 s committed
    // calm baseline, with every sentinel reading calm — the window
    // trigger never fired. The history trigger flags exactly that row.
    val rows = Seq(
      ("q1_a", 14.1, Seq(14.1, 14.3, 14.2)),   // 12x its 1.17 history
      ("q2_b", 1.0, Seq(1.0, 1.2, 1.1)),       // within 4x of 0.9
      ("q3_new", 50.0, Seq(50.0, 50.0, 50.0)), // NO history: new rows never retry on this rule
      ("q4_err", -1.0, Seq(-1.0, 9.9, 9.9)),   // errored: a correctness fact, never retried
      ("q5_zero", 9.0, Seq(9.0)),              // non-positive history: corrupt baseline, inert
      ("q6_c", 8.0, Seq(8.0, 2.0, 8.0)))       // MIN is 2.0 <= 4x1.0: min semantics, not median
    val history = Map("q1_a" -> 1.17, "q2_b" -> 0.9, "q4_err" -> 1.0,
      "q5_zero" -> 0.0, "q6_c" -> 1.0)
    assert(BenchFormat.historyOutliers(rows, history) == Seq(0))
    // the factor is strict: exactly 4x stays calm
    assert(BenchFormat.historyOutliers(
      Seq(("q1_a", 4.0, Seq(4.0))), Map("q1_a" -> 1.0)).isEmpty)
    assert(BenchFormat.historyOutliers(
      Seq(("q1_a", 4.01, Seq(4.01))), Map("q1_a" -> 1.0)) == Seq(0))
    // several flagged rows order slowest-first (the shared-cap rule)
    assert(BenchFormat.historyOutliers(
      Seq(("q1_a", 5.0, Seq(5.0)), ("q2_b", 50.0, Seq(50.0))),
      Map("q1_a" -> 1.0, "q2_b" -> 1.0)) == Seq(1, 0))
    // no committed baseline at all -> the rule is inert, never a crash
    assert(BenchFormat.historyOutliers(rows, Map.empty).isEmpty)
  }

  test("BenchFormat: calmBase survives an all-errored sentinel series (ADVICE r18 — the retry pass skips instead of dying)") {
    // reachable shape: the history trigger plans retries while every
    // sentinel probe errored — the old inline `.min` threw
    // UnsupportedOperationException AFTER all queries ran, killing the
    // artifact on its own baseline
    assert(BenchFormat.calmBase(Seq((0, -1.0), (5, -1.0), (9, -1.0))).isEmpty)
    assert(BenchFormat.calmBase(Seq.empty).isEmpty)
    // valid readings produce the min; pending (-1) readings never set it
    assert(BenchFormat.calmBase(Seq((0, 0.4), (5, -1.0), (9, 0.3)))
      .contains(0.3))
  }

  test("the committed BENCH_HISTORY baseline parses, is SF-stamped, and names only live queries") {
    // the history trigger silently disarms row-by-row when its keys go
    // stale (a renamed/removed query never matches) — this makes a
    // stale committed baseline a loud failure, forcing the documented
    // regen step (tools/make_history.py) after registry changes
    val j = parse(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/BENCH_HISTORY.json")))
    assert(j.get("__sf") != null && j.get("__sf").asText.startsWith("sf"),
      "the baseline must record the scale factor it was measured at")
    import scala.jdk.CollectionConverters._
    val keys = j.fieldNames.asScala.filterNot(_.startsWith("__")).toSet
    val names = SparkEntry.allQueries.map(_.name).toSet
    assert((keys -- names).isEmpty,
      s"stale history keys (regenerate BENCH_HISTORY.json): ${(keys -- names).take(5)}")
    // and every recorded min is a usable positive baseline
    keys.foreach(k => assert(j.get(k).asDouble(-1) > 0, s"$k baseline"))
  }

  test("BenchFormat: a mass-failure run still fits the budget with capped, accounted errors") {
    // every row errors: the errors array alone would blow the tail
    // window without the MaxNamedErrors cap
    val rows = (1 to 300).map(i => (s"q${i}_synthetic", -1.0, Seq(-1.0, -1.0, -1.0)))
    val line = BenchFormat.compactLine(rows, "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.TailBudget, s"${line.length} chars")
    val j = parse(line)
    assert(j.get("errors").size == BenchFormat.MaxNamedErrors)
    assert(j.get("errors_omitted").asInt == 300 - BenchFormat.MaxNamedErrors)
    // and a zero-error run carries NO errors / errors_omitted fields at
    // all (absence == empty/0 — the chars are zero-omission headroom)
    val clean = parse(BenchFormat.compactLine(Seq(("q1_a", 1.0, Seq(1.0))), "sf"))
    assert(clean.get("errors_omitted") == null)
    assert(clean.get("errors") == null)
    // degenerate rep lists must not throw (the formatter can never be
    // what kills a snapshot write)
    val weird = Seq(("q1_a", 1.0, Seq.empty[Double]), ("q2_b", 2.0, Seq(-1.0)))
    val l2 = parse(BenchFormat.compactLine(weird, "sf"))
    assert(l2.get("queries").get("1").asDouble == 10.0, "empty reps fall back to the median (in ds)")
  }

  test("BenchFormat: total_min <= total, and a contended median does not move the mins") {
    val calm = Seq(("q1_a", 1.0, Seq(1.0, 1.0, 1.0)), ("q2_b", 2.0, Seq(2.0, 2.0, 2.0)))
    val spiky = Seq(("q1_a", 9.0, Seq(1.0, 9.0, 30.0)), ("q2_b", 2.0, Seq(2.0, 2.0, 2.0)))
    val a = parse(BenchFormat.compactLine(calm, "sf"))
    val b = parse(BenchFormat.compactLine(spiky, "sf"))
    // the contention signature: value (median sum) inflates 11 -> ...,
    // but the per-query mins and total_min are IDENTICAL — exactly what
    // makes a q113-style spike attributable from this artifact alone
    assert(a.get("queries").get("1").asDouble == b.get("queries").get("1").asDouble)
    assert(a.get("total_min").asDouble == b.get("total_min").asDouble)
    assert(b.get("value").asDouble > a.get("value").asDouble)
    assert(b.get("total_min").asDouble <= b.get("value").asDouble)
  }
}
