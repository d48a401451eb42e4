package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Kll, KllSketch}

/** The KLL-style updatable sketch's guarantees, pinned:
  * the certified rank-error bound holds for EVERY probe value, weight is
  * conserved, merge adds bounds, small streams stay exact, and the
  * deterministic compaction makes reruns bit-identical.
  */
class KllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Deterministic pseudo-shuffled stream 0..n-1 (fixed LCG permutation —
    * adversarial enough to exercise compaction, reproducible always).
    */
  private def stream(n: Int): Array[Long] = {
    // prime-multiplier walk: a permutation of 0..n-1 whenever 7919 ∤ n
    require(n % 7919 != 0)
    Array.tabulate(n)(i => (7919L * i + 12345) % n)
  }

  test("certified bound: |est - true| <= errBound for every probe, and the bound is non-trivial") {
    val n = 10000
    val s = KllSketch.empty(64)
    stream(n).foreach(s.update)
    assert(s.count == n)
    assert(s.retainedWeight == n, "compaction must conserve total weight")
    // probe every 37th value plus the extremes: true rank of v is v+1
    val probes = (0L until n.toLong by 37L) ++ Seq(0L, n - 1L)
    probes.foreach { v =>
      val est = s.estRankLe(v)
      val truth = v + 1
      assert(math.abs(est - truth) <= s.errBound,
        s"v=$v est=$est true=$truth bound=${s.errBound}")
    }
    // the bound must certify something useful: well under n (k=64 over
    // 10k values lands near (n/k)·log2(n/k) ~ 1100; n/4 is the red line)
    assert(s.errBound > 0 && s.errBound <= n / 4,
      s"certified bound degenerate: ${s.errBound} for n=$n")
  }

  test("updatable: estimates stay bound-certified mid-stream, not only at the end") {
    val s = KllSketch.empty(32)
    val data = stream(5000)
    var fed = 0
    data.grouped(1000).foreach { chunk =>
      chunk.foreach(s.update)
      fed += chunk.length
      val sorted = data.take(fed).sorted
      val v = sorted(fed / 2)
      val truth = sorted.count(_ <= v).toLong
      assert(math.abs(s.estRankLe(v) - truth) <= s.errBound,
        s"after $fed updates: est=${s.estRankLe(v)} true=$truth bound=${s.errBound}")
    }
  }

  test("merge: level-wise union keeps the summed certified bound over the combined stream") {
    val a = KllSketch.empty(64)
    val b = KllSketch.empty(64)
    val dataA = stream(4000)
    val dataB = stream(6000).map(_ + 2500L) // overlapping range
    dataA.foreach(a.update)
    dataB.foreach(b.update)
    val boundA = a.errBound; val boundB = b.errBound
    val m = a.merge(b)
    assert(m.count == 10000 && m.retainedWeight == 10000)
    assert(m.errBound >= boundA + boundB, "merge must not forget either side's error")
    val all = (dataA ++ dataB).sorted
    (0L until 8500L by 53L).foreach { v =>
      val truth = {
        var lo = 0; var hi = all.length
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (all(mid) <= v) lo = mid + 1 else hi = mid }
        lo.toLong
      }
      assert(math.abs(m.estRankLe(v) - truth) <= m.errBound,
        s"v=$v est=${m.estRankLe(v)} true=$truth bound=${m.errBound}")
    }
  }

  test("exact below capacity: no compaction, errBound 0, quantiles are exact PERCENTILE_DISC") {
    val s = KllSketch.empty(200)
    val data = Array(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 10L)
    data.foreach(s.update)
    assert(s.errBound == 0)
    // ceil(q*n/1000) ranks over 1..10: p500 -> rank 5 -> value 5; p900 -> 9; p1000 -> 10
    assert(s.quantile(500) == 5L)
    assert(s.quantile(900) == 9L)
    assert(s.quantile(1000) == 10L)
  }

  test("deterministic: identical update sequence yields the identical sketch structure") {
    def build() = { val s = KllSketch.empty(16); stream(3000).foreach(s.update); s }
    val s1 = build(); val s2 = build()
    assert(s1.structure == s2.structure, "alternating-parity compaction must be reproducible")
    assert(s1.errBound == s2.errBound && s1.count == s2.count)
    assert(Seq(500, 900, 990).map(s1.quantile) == Seq(500, 900, 990).map(s2.quantile))
  }

  test("serialization round-trip: fromBytes(toBytes) preserves structure, bound, and every estimate") {
    val s = KllSketch.empty(16)
    stream(3000).foreach(s.update)
    val back = KllSketch.fromBytes(s.toBytes)
    assert(back.k == s.k && back.count == s.count && back.errBound == s.errBound)
    assert(back.structure == s.structure)
    (0L until 3000L by 97L).foreach(v => assert(back.estRankLe(v) == s.estRankLe(v)))
    // and the revived sketch still UPDATES and MERGES like the original
    // (it is the aggregation-buffer wire format, not a read-only export)
    val o = KllSketch.empty(16)
    (3000L until 4000L).foreach(o.update)
    back.merge(o)
    assert(back.count == 4000 && back.retainedWeight == 4000)
  }

  test("grouped aggregate: per-group sketches, each estimate's true rank within its emitted bound") {
    import spark.implicits._
    val byLang = Tables.documents(spark, sf)
      .groupBy($"lang")
      .agg(graft.functions.KllAgg(length($"text").cast("long"), 32, Seq(500, 900)).as("qs"))
      .select($"lang", $"qs.n", $"qs.err_bound", $"qs.q_500", $"qs.q_900")
      .collect()
    assert(byLang.nonEmpty)
    val exactByLang = Tables.documents(spark, sf)
      .select($"lang", length($"text").cast("long").as("len"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byLang.foreach { r =>
      val (lang, n, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val exact = exactByLang(lang)
      assert(n == exact.length, s"$lang: n=$n vs ${exact.length}")
      Seq((500, r.getLong(3)), (900, r.getLong(4))).foreach { case (p, v) =>
        val target = (p * n + 999) / 1000
        val trueRank = exact.count(_ <= v).toLong
        // the certified pick guarantee: est(v) >= target and |est-true| <= err
        // => true rank can undershoot the target by at most err
        assert(trueRank >= target - err && trueRank <= n,
          s"$lang p$p: v=$v trueRank=$trueRank target=$target err=$err")
      }
      assert(err < math.max(4, n), s"$lang: degenerate bound $err for n=$n")
    }
  }

  test("streaming complete-mode grouped KLL: certified bound survives arbitrary micro-batch merge order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"event_type", ($"value" * 100).cast("long").as("v100"))
      .as[(String, Long)].collect()
    val (chunk1, chunk2) = rows.splitAt(rows.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = input.toDS().toDF("event_type", "v100")
      .groupBy($"event_type")
      .agg(graft.functions.KllAgg($"v100", 32, Seq(500)).as("qs"))
      .select($"event_type", $"qs.n", $"qs.err_bound", $"qs.q_500")
      .writeStream.outputMode("complete").format("memory")
      .queryName("kll_stream").start()
    try {
      input.addData(chunk1.toIndexedSeq)
      q.processAllAvailable()
      input.addData(chunk2.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("kll_stream").collect()
      val exactBy = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(got.map(_.getString(0)).toSet == exactBy.keySet)
      got.foreach { r =>
        val (et, n, err, v) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val exact = exactBy(et)
        assert(n == exact.length, s"$et: streamed n=$n vs ${exact.length}")
        val target = (500 * n + 999) / 1000
        val trueRank = exact.count(_ <= v).toLong
        assert(trueRank >= target - err && trueRank <= n,
          s"$et: v=$v trueRank=$trueRank target=$target err=$err")
      }
    } finally q.stop()
  }

  test("sketch store: BINARY sketches survive a parquet round-trip and roll up within the merged bound") {
    import spark.implicits._
    val lens = Tables.documents(spark, sf)
      .select($"lang", length($"text").cast("long").as("len"))
    val perLang = lens.groupBy($"lang")
      .agg(graft.functions.KllSketchBytesAgg($"len", 32).as("sk"))
    // persist the sketch column as DATA, reload, and roll up from bytes
    val dir = java.nio.file.Files.createTempDirectory("graft-kll-store").toString
    perLang.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val rolled = reloaded
      .agg(graft.functions.KllMergeAgg($"sk", 32, Seq(500, 900)).as("qs"))
      .select($"qs.n", $"qs.err_bound", $"qs.q_500", $"qs.q_900")
      .head()
    val exact = lens.select($"len").as[Long].collect().sorted
    assert(rolled.getLong(0) == exact.length, "rollup must see every original row's weight")
    val err = rolled.getLong(1)
    Seq((500, rolled.getLong(2)), (900, rolled.getLong(3))).foreach { case (p, v) =>
      val target = (p * exact.length.toLong + 999) / 1000
      val trueRank = exact.count(_ <= v).toLong
      assert(trueRank >= target - err && trueRank <= exact.length,
        s"p$p: v=$v trueRank=$trueRank target=$target err=$err")
    }
    // the rollup-from-store answers exactly like merging in one session:
    // same bytes in, deterministic merge per input order — and a direct
    // ungrouped sketch over the same rows agrees on n and stays bound-valid
    val direct = lens
      .agg(graft.functions.KllAgg($"len", 32, Seq(500)).as("qs"))
      .select($"qs.n").head().getLong(0)
    assert(direct == exact.length)
  }

  test("Spark path: per-partition sketches merged in pid order, bound holds vs the exact ranks") {
    import spark.implicits._
    val lens = Tables.documents(spark, sf)
      .select(length($"text").cast("long").as("len"))
    val s = Kll.sketch(lens, "len", k = 64)
    val exact = lens.as[Long].collect().sorted
    assert(s.count == exact.length)
    Seq(500, 900, 990).foreach { q =>
      val v = s.quantile(q)
      val truth = exact.count(_ <= v).toLong
      assert(math.abs(s.estRankLe(v) - truth) <= s.errBound,
        s"p$q: est=${s.estRankLe(v)} true=$truth bound=${s.errBound}")
    }
    // determinism given the layout: the whole pipeline reruns identically
    val s2 = Kll.sketch(lens, "len", k = 64)
    assert(s.structure == s2.structure && s.errBound == s2.errBound)
  }

  test("fromBytes validates the wire header: corrupt bytes fail loudly, not with buffer underflow") {
    val good = {
      val s = KllSketch.empty(8)
      (1L to 100L).foreach(s.update)
      s.toBytes
    }
    // round trip still fine
    assert(KllSketch.fromBytes(good).count == 100)
    def expectBad(bytes: Array[Byte], clue: String): Unit = {
      val e = intercept[IllegalArgumentException](KllSketch.fromBytes(bytes))
      assert(e.getMessage.contains("KLL sketch"), s"$clue: ${e.getMessage}")
    }
    expectBad(Array[Byte](1, 2, 3), "truncated header")
    // k < 4 in the header
    val badK = good.clone(); java.nio.ByteBuffer.wrap(badK).putInt(0, 1)
    expectBad(badK, "k below minimum")
    // a level length far beyond the remaining bytes must not allocate
    val badLen = good.clone()
    java.nio.ByteBuffer.wrap(badLen).putInt(25, Int.MaxValue) // first level's len field
    expectBad(badLen, "oversized level length")
    // negative nLevels
    val badLv = good.clone(); java.nio.ByteBuffer.wrap(badLv).putInt(4, -3)
    expectBad(badLv, "negative nLevels")
  }

  test("aggregate input contracts: non-integral child and duplicate permilles are rejected") {
    import spark.implicits._
    // a DOUBLE child would silently truncate via Number.longValue — the
    // documented cast-upstream contract is now enforced at analysis time
    val doubles = Seq(1.5, 2.5).toDF("v")
    val e = intercept[Exception] {
      doubles.agg(graft.functions.KllAgg($"v", 8, Seq(500)).as("qs")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral"), e.getMessage)
    val e2 = intercept[Exception] {
      doubles.agg(graft.functions.KllSketchBytesAgg($"v", 8).as("sk")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("integral"), e2.getMessage)
    // kll_merge wants BYTES, not numbers
    val e3 = intercept[Exception] {
      Seq(1L).toDF("v").agg(graft.functions.KllMergeAgg($"v", 8, Seq(500))).collect()
    }
    assert(e3.getMessage.toLowerCase.contains("bytes"), e3.getMessage)
    // duplicate permilles would emit ambiguous q_500 twins — constructor rejects
    val e4 = intercept[IllegalArgumentException] {
      graft.functions.KllAgg($"v", 8, Seq(500, 500))
    }
    assert(e4.getMessage.contains("distinct"), e4.getMessage)
  }
}
