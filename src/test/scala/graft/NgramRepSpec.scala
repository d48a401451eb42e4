package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramRep

/** Pins the MassiveText n-gram repetition character-coverage rules
  * (q211) against hand-computed cases:
  *   - top-n-gram coverage is the interval UNION of the winning gram's
  *     occurrences (overlaps not double-counted), computed even when
  *     nothing repeats (the published behavior);
  *   - the dup-n-gram tier covers ALL duplicated grams and stays zero
  *     when nothing repeats;
  *   - deterministic tie-break on (count DESC, md5 ASC);
  *   - offsets are 1-based character positions over the raw whitespace
  *     split (newlines ride inside words, exactly like the oracle);
  *   - degenerate docs (empty, single word, shorter than n) report 0.
  */
class NgramRepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(d: DataFrame,
                  topNs: Seq[Int] = Seq(2),
                  dupNs: Seq[Int] = Seq(5)): Map[Long, Map[String, Long]] =
    NgramRep.ngramCoverage(d, topNs = topNs, dupNs = dupNs)
      .collect()
      .map { r =>
        r.getAs[Long]("doc_id") ->
          r.schema.fieldNames.filter(_ != "doc_id")
            .map(f => f -> r.getAs[Long](f)).toMap
      }.toMap

  test("top-bigram coverage: hand-computed union on 'a b a b a b'") {
    // words at 1-based offsets 1,3,5,7,9,11; "a b" occurs at spans
    // (1,3),(5,7),(9,11) [count 3], "b a" at (3,5),(7,9) [count 2] —
    // winner "a b", union 9 of 11 chars -> 818 permille
    val out = run(df(1L -> "a b a b a b"))
    assert(out(1L)("total_chars") == 11L)
    assert(out(1L)("top2gram_char_permille") == 9000L / 11L)
    // the 5-gram tier: "a b a b a" and "b a b a b" both occur once ->
    // nothing duplicated
    assert(out(1L)("dup5gram_char_permille") == 0L)
  }

  test("overlapping occurrences never double-count: 'a a a a' top-bigram") {
    // "a a" occurs at (1,3),(3,5),(5,7): overlapping spans whose union
    // is the whole 7-char text -> exactly 1000, not 9/7 of it
    val out = run(df(1L -> "a a a a"))
    assert(out(1L)("top2gram_char_permille") == 1000L)
  }

  test("dup-5-gram coverage: a fully periodic doc covers everything; a clean doc covers nothing") {
    // "x y" * 5: every 5-gram occurs at least twice -> full coverage
    val periodic = Seq.fill(5)("x y").mkString(" ")
    // 10 distinct words -> every 5-gram unique -> zero
    val clean = (0 until 10).map(i => s"w$i").mkString(" ")
    val out = run(df(1L -> periodic, 2L -> clean))
    assert(out(1L)("dup5gram_char_permille") == 1000L)
    assert(out(2L)("dup5gram_char_permille") == 0L)
    // top-bigram on the clean doc still reports its (unique) winner's
    // span — the published top-n-gram rule does not require repetition
    assert(out(2L)("top2gram_char_permille") > 0L)
  }

  test("partial duplication: planted repeated 5-gram covers exactly its union") {
    // the 5-gram "p q r s t" appears at word 0 and word 10 of a
    // 15-word doc; each occurrence spans 9 chars, disjoint -> 18 chars
    val run5 = "p q r s t"
    val mids = (0 until 5).map(i => s"m$i").mkString(" ")
    val text = s"$run5 $mids $run5"
    val out = run(df(1L -> text))
    assert(out(1L)("total_chars") == text.length.toLong)
    // occurrences: chars [1,9] and [text.length-8, text.length]
    assert(out(1L)("dup5gram_char_permille") == 18L * 1000L / text.length)
  }

  test("deterministic top tie-break on (count DESC, md5 ASC)") {
    // "a b c d": bigrams "a b","b c","c d" each count 1 -> winner is
    // the md5-smallest; whatever it is, coverage = one 3-char span
    val out = run(df(1L -> "a b c d"))
    assert(out(1L)("top2gram_char_permille") == 3000L / 7L)
    // and it is the SAME result on every run (pure function)
    val again = run(df(1L -> "a b c d"))
    assert(out == again)
  }

  test("degenerate docs: empty, single-word, shorter than n") {
    val out = run(df(1L -> "", 2L -> "single", 3L -> "two words"))
    assert(out(1L)("total_chars") == 0L &&
      out(1L)("top2gram_char_permille") == 0L &&
      out(1L)("dup5gram_char_permille") == 0L)
    assert(out(2L)("top2gram_char_permille") == 0L)
    // "two words" has one bigram spanning the whole text
    assert(out(3L)("top2gram_char_permille") == 1000L)
    assert(out(3L)("dup5gram_char_permille") == 0L)
  }

  test("n in both tiers is rejected; full default ladder runs on the fixture") {
    intercept[IllegalArgumentException] {
      NgramRep.ngramCoverage(df(1L -> "a b"), topNs = Seq(2), dupNs = Seq(2))
    }
    val fx = spark.read.parquet(
      graft.queries.CurationQueries.GopherFixture.ensure(spark))
    val out = NgramRep.ngramCoverage(fx).collect()
    assert(out.length == fx.count().toInt, "every doc keeps a row")
    // the fixture's repeated footer lines are word-level repetition the
    // 10-gram rule must see in at least the heavy-footer docs
    val dup10 = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("dup10gram_char_permille")).toMap
    assert(dup10.values.exists(_ > 0L), "repeated footers must surface")
    // and every permille is a valid per-mille
    out.foreach { r =>
      r.schema.fieldNames.filter(_.endsWith("_permille")).foreach { f =>
        val v = r.getAs[Long](f)
        assert(v >= 0L && v <= 1000L, s"$f = $v out of range")
      }
    }
  }
}
