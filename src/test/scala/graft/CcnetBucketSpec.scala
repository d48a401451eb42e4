package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q214 CCNet perplexity-bucketing and q215 tokenizer-fertility
  * compositions beyond their DuckDB gates:
  *   - q214 buckets match an INDEPENDENT Scala reimplementation of the
  *     per-language tercile cut (sort + the symmetric lerp + the
  *     ties-to-lower-bucket compare) for every doc at sf0.001;
  *   - the bucket boundaries are strict per language (max head score <
  *     min middle score < ... — the cut semantics, not an artifact of
  *     the data);
  *   - q215 invariants that hold for ANY corpus/tokenizer pair: every
  *     word is at least one token (fertility >= 1000 wherever words
  *     exist), token totals are at least word totals, and the emitted
  *     milli-ratios re-derive from the emitted totals.
  */
class CcnetBucketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** The tercile cut exactly as Percentiles.exactInterpolated and
    * QUANTILE_CONT define it: r = p(n-1), symmetric lerp of the two
    * bracketing order statistics.
    */
  private def cut(sorted: IndexedSeq[Long], p: Double): Double = {
    val r = p * (sorted.size - 1)
    val lo = math.floor(r).toInt
    val hi = math.min(lo + 1, sorted.size - 1)
    val frac = r - lo
    (1.0 - frac) * sorted(lo) + frac * sorted(hi)
  }

  test("q214 buckets == independent per-language tercile reimplementation") {
    val rows = SparkEntry.queries("q214_ccnet_buckets")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_._2)
    assert(byLang.size >= 2, s"want multiple languages live, got ${byLang.keySet}")
    byLang.foreach { case (lang, docs) =>
      val sorted = docs.map(_._3).sorted.toIndexedSeq
      val (c1, c2) = (cut(sorted, 1.0 / 3), cut(sorted, 2.0 / 3))
      docs.foreach { case (id, _, score, bucket) =>
        val want =
          if (score <= c1) "head" else if (score <= c2) "middle" else "tail"
        assert(bucket == want,
          s"doc $id lang $lang score $score: got $bucket want $want (cuts $c1/$c2)")
      }
      // strict boundaries: the cut compare leaves no overlap between buckets
      val s = docs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for (h <- s.get("head"); m <- s.get("middle")) assert(h.max < m.min)
      for (m <- s.get("middle"); t <- s.get("tail")) assert(m.max < t.min)
    }
  }

  test("q215 fertility invariants + milli-ratios re-derive from totals") {
    val rows = SparkEntry.queries("q215_tokenizer_fertility")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length >= 2, s"want multiple language rows, got ${rows.length}")
    rows.foreach { case (lang, nDocs, nWords, nTok, fert, _) =>
      assert(nDocs > 0)
      assert(nTok >= nWords, s"$lang: a word is at least one token")
      if (nWords > 0)
        assert(fert >= 1000L && fert == nTok * 1000L / nWords,
          s"$lang: fertility $fert vs ${nTok * 1000L / nWords}")
    }
  }
}
