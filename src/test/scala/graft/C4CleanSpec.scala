package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q216 C4 line-cleaning row beyond its DuckDB gate: every
  * output row must match an INDEPENDENT plain-Scala reimplementation of
  * the rules (space-only trim, terminal-punct set, >= 5 nonempty
  * space-split words, lowered-contains javascript, the lorem/brace/
  * 3-line doc rules, md5 of the newline-joined survivors), and the
  * planted edge docs must each be dropped/kept by EXACTLY the rule
  * they exist for.
  */
class C4CleanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private val Terminal = Set('.', '!', '?', '"')

  /** Space-ONLY trim — Scala's .trim strips tabs too, which is exactly
    * the divergence the 909 tab doc exists to catch.
    */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def clean(text: String): (Long, Seq[String], Long, Long, Long) = {
    val lines = text.split("\n", -1).toSeq.map(trimSpaces).filter(_.nonEmpty)
    val kept = lines.filter { l =>
      Terminal.contains(l.last) &&
        l.split(" ", -1).count(_.nonEmpty) >= 5 &&
        !l.toLowerCase.contains("javascript")
    }
    val hasLorem = if (text.toLowerCase.contains("lorem ipsum")) 1L else 0L
    val hasBrace = if (text.contains("{")) 1L else 0L
    val keep = if (kept.size >= 3 && hasLorem == 0 && hasBrace == 0) 1L else 0L
    (lines.size.toLong, kept, hasLorem, hasBrace, keep)
  }

  test("q216 rows == independent plain-Scala reimplementation, every doc") {
    val raw = spark.read
      .parquet(graft.queries.CurationQueries.C4Fixture.ensure(spark))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("q216_c4_line_clean")(spark, "unused")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
      .toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (id, text) =>
      val (nl, kept, lorem, brace, keep) = clean(text)
      val want = (nl, kept.size.toLong, lorem, brace, keep, md5hex(kept.mkString("\n")))
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    // the corpus must exercise every doc-drop cause AND healthy keeps
    val keeps = got.values.map(_._5)
    assert(keeps.count(_ == 1L) > 300, "healthy keeps missing")
    assert(got.values.exists(v => v._3 == 1L && v._2 >= 3), "lorem-only drop missing")
    assert(got.values.exists(v => v._4 == 1L && v._3 == 0L && v._2 >= 3), "brace-only drop missing")
    assert(got.values.exists(v => v._2 < 3 && v._3 == 0L && v._4 == 0L), "line-floor drop missing")
  }

  test("q216 edge docs are each decided by exactly their planted rule") {
    val got = SparkEntry.queries("q216_c4_line_clean")(spark, "unused")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
      .toMap
    assert(got(900L) == ((0L, 0L, 0L, 0L, 0L, md5hex(""))), "empty doc")
    assert(got(901L)._2 == 0L, "nav line must fail the terminal-punct rule")
    assert(got(902L)._2 == 2L && got(902L)._5 == 0L, "two clean lines sit below the 3-line floor")
    assert(got(903L)._2 == 3L && got(903L)._5 == 1L, "three clean lines are the floor")
    assert(got(904L)._2 == 0L, "uppercase JavaScript must still match (lowered contains)")
    assert(got(905L)._2 == 0L, "javascript embedded in a longer token matches (contains, not word-boundary)")
    assert(got(906L)._2 == 4L, "trailing spaces trim before the terminal-punct check")
    assert(got(907L) == ((1L, 0L, 0L, 1L, 0L, md5hex(""))), "brace-only doc")
    assert(got(908L)._3 == 1L && got(908L)._2 == 4L && got(908L)._5 == 0L,
      "lorem doc keeps its lines but loses the page — the DOC rule alone drops it")
    // 909: the tab-leading line SURVIVES the space-only trim and rides
    // into the cleaned text — byte-pinned through the md5
    val raw909 = spark.read
      .parquet(graft.queries.CurationQueries.C4Fixture.ensure(spark))
      .filter(org.apache.spark.sql.functions.col("doc_id") === 909L)
      .collect()(0).getString(1)
    val kept909 = clean(raw909)._2
    assert(kept909.head.startsWith("\t"), "fixture must lead with a literal tab")
    assert(got(909L)._2 == 3L && got(909L)._5 == 1L &&
      got(909L)._6 == md5hex(kept909.mkString("\n")))
  }

  test("c4KeptLines is idempotent and an ordered subsequence of the lines (randomized adversarial corpus)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // re-running a cleaning pipeline over already-cleaned pages must be
    // a no-op — the operational property a resumed/replayed ingest
    // relies on. It holds because every survivor is closed under the
    // rules (trimmed, nonempty, punct-terminated, >= 5 words, no
    // javascript) and the rejoin/resplit round-trips survivors exactly
    // (no survivor can contain a newline). One Spark job over a
    // seed-fixed adversarial corpus: javascript in three cases, braces,
    // tabs, runs of spaces, empty and whitespace-only lines, every
    // terminator, words straddling the 5-word boundary.
    val rnd = new scala.util.Random(20260816L)
    val words = Vector("the", "data", "javascript", "JavaScript", "lorem",
      "ipsum", "a", "pipeline", "{x}", "value", "\tindent", "two  spaces")
    val ends = Vector(".", "!", "?", "\"", "", " ", "...")
    def line(): String = {
      val n = 1 + rnd.nextInt(8)
      (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" ") +
        ends(rnd.nextInt(ends.size))
    }
    def doc(): String =
      (0 until rnd.nextInt(8)).map(_ =>
        if (rnd.nextInt(10) == 0) Vector("", "   ", "\t")(rnd.nextInt(3)) else line())
        .mkString("\n")
    val docs = (0 until 300).map(i => (i.toLong, doc()))
    val got = docs.toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextFns.lineArray($"text").as("lines"),
        graft.functions.TextFns.c4KeptLines($"text").as("kept"),
        graft.functions.TextFns.c4KeptLines(
          array_join(graft.functions.TextFns.c4KeptLines($"text"), "\n")).as("recleaned"))
      .collect()
    var keptTotal = 0
    got.foreach { r =>
      val lines = r.getSeq[String](1)
      val kept = r.getSeq[String](2)
      val recleaned = r.getSeq[String](3)
      assert(recleaned == kept, s"doc ${r.getLong(0)}: not idempotent\n$kept\n$recleaned")
      // kept must be an ORDERED subsequence of the trimmed lines
      var i = 0
      kept.foreach { k =>
        val j = lines.indexOf(k, i)
        assert(j >= 0, s"doc ${r.getLong(0)}: survivor '$k' not found in order")
        i = j + 1
      }
      keptTotal += kept.size
    }
    assert(keptTotal > 50, s"corpus too tame to exercise the rules ($keptTotal survivors)")
    assert(got.exists(r => r.getSeq[String](2).size < r.getSeq[String](1).size),
      "corpus must actually drop lines")
  }
}
