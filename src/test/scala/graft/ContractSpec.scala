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
    "q154_audio_spectral")     // float DSP (FFT) is not SQL-expressible; DspSpec pins FFT==DFT, Parseval, exact planted-tone recovery

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

  test("Bench's compact stdout line stays inside the driver's 2000-char tail capture") {
    // The driver parses the LAST stdout line from a 2000-char tail (NOTES
    // rule 12). The compact line is {"metric":...,"queries":{"qNN":X.X,...}}
    // with short qNN keys and Bench.fmtCompact's 5-char-max values —
    // estimate its worst case and fail BEFORE the artifact silently
    // truncates as the query count grows.
    val overhead = """{"metric":"total","value":99999.9,"unit":"sec","total_min":99999.9,"queries":{},"errors":[],"sf":"/root/testdata/sf0.1"}""".length
    // fmtCompact value widths: <10 s → "9.9" (3 chars), <100 s → "99.9"
    // (4), ≥100 s → clamped "999" (3). Worst-case model: every query at
    // the 3-char tier plus a 20-query allowance at the 4-char tier —
    // the whole bench runs ~80 s cumulative at sf0.1, so even twenty
    // 10 s+ rows is already a 2.5× regression scenario; beyond that the
    // artifact's precision is the least of the problems. The clamp and
    // this tiering exist to keep the LAST stdout line inside the
    // driver's 2000-char tail as the query count grows.
    // keys are the bare query number (Bench.shortKey strips the q prefix
    // and the _suffix): "113":9.9,
    val perQuery = "\"000\":9.9,".length
    val estimate = overhead + SparkEntry.queries.size * perQuery + 20
    assert(estimate < 1900,
      s"estimated compact bench line $estimate chars — nearing the 2000-char tail capture; shorten keys or split the artifact")
  }
}
