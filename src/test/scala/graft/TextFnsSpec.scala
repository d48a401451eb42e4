package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns

class TextFnsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("q186 fixture: the raw-md5 fallback never false-merges distinct unsegmentable docs; exact dups collapse; fp_uni(NULL) is NULL") {
    import spark.implicits._
    val out = SparkEntry.queries("q186_unseg_fallback_scale")(spark, "unused").cache()
    val docs = spark.read.parquet(graft.queries.TextQueries.UnsegFixture.Root)
    // NO FALSE MERGES: distinct raw texts → distinct fingerprint keys
    // (the md5('') collision class must not reappear one script out)
    val nTexts = docs.select("txt").distinct().count()
    val nKeys = out.select("fp_uni").distinct().count()
    assert(nKeys == nTexts, s"$nKeys fingerprint keys for $nTexts distinct texts — a false merge")
    // exact duplicates collapse: the 200 planted dup rows are all
    // non-survivors pointing at their originals
    val dupRows = out.filter($"doc_id" >= 2400 && $"doc_id" < 2600)
    assert(dupRows.count() == 200 && dupRows.filter($"is_survivor").count() == 0)
    assert(dupRows.filter($"survivor" >= 1200).count() == 0, "dup survivors must be the original Thai docs")
    // the punctuation/whitespace variants do NOT merge (conservative
    // failure: distinct keys, both survivors of their own class)
    assert(out.filter($"doc_id" >= 2603 && $"is_survivor").count() == 2)
    // empty docs share the canonical md5('') class: one survivor
    val empt = out.filter($"doc_id" >= 2600 && $"doc_id" < 2603)
    assert(empt.filter($"is_survivor").count() == 1)
    out.unpersist()
    // NULL propagation (the round-10 advisor fix): null text → null key,
    // never the md5('') empty-content class
    val fp = Seq((1L, null: String), (2L, ""), (3L, "x"))
      .toDF("id", "t").select(TextFns.fingerprintUni($"t")).collect().map(_.getString(0))
    assert(fp(0) == null, "fingerprintUni(NULL) must be NULL")
    assert(fp(1) != null && fp(0) != fp(1), "null and empty content must not share a dedup key")
  }

  test("normalize lowercases, strips punct, collapses whitespace") {
    import spark.implicits._
    val got = Seq("  Hello,   WORLD!! 42  ").toDF("t")
      .select(TextFns.normalize($"t")).as[String].head()
    assert(got == "hello world 42")
  }

  test("piiFrame scrubs emails/IPv4s/SSNs with placeholders and counts each class") {
    import spark.implicits._
    // the q53-era hand case, now through the single PiiFns authority
    val text = "mail bob.smith+x@corp.example.org from 192.168.1.254 ssn 123-45-6789 " +
      "and a@b.io again; not-pii: 1.2.3 (three octets), 12-34-5678 (wrong shape)"
    val row = graft.functions.PiiFns
      .piiFrame(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .select($"redacted", $"email_count", $"ip_count", $"ssn_count", $"phone_count")
      .head()
    val redacted = row.getString(0)
    assert(redacted.contains("<EMAIL>") && redacted.contains("<IP>") && redacted.contains("<SSN>"))
    assert(!redacted.contains("@") && !redacted.contains("192.168"), redacted)
    assert(redacted.contains("1.2.3") && redacted.contains("12-34-5678"),
      s"near-miss shapes must survive: $redacted")
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ==
      ((2L, 1L, 1L, 0L)))
  }

  test("shingles: 3-grams of a 5-token text; short texts yield empty") {
    import spark.implicits._
    val got = Seq("a b c d e").toDF("t")
      .select(TextFns.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("t")
      .select(TextFns.shingles($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("langId picks the marker-richest language deterministically") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist gut",
      "el perro y la casa que una vez",
      "我是学生他的书在这里").toDF("t") // CJK: no \b boundaries exist
    val got = df.select(TextFns.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "zh"))
  }

  test("fingerprint is md5 of normalized text") {
    import spark.implicits._
    val got = Seq("Hello World").toDF("t")
      .select(TextFns.fingerprint($"t")).as[String].head()
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got == exp)
  }

  test("rollingFingerprint matches the reference fold; empty text = seed") {
    import spark.implicits._
    // reference: h=7; for c in "hello world": h = (h*31 + c) mod 1e9+7
    var h = 7L
    "hello world".foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
    val got = Seq("hello world", "").toDF("t")
      .select(TextFns.rollingFingerprint($"t")).as[Long].collect().toSeq
    assert(got == Seq(h, 7L))
    assert(h == 234728892L) // pinned cross-engine value (same in DuckDB oracle)

    // a seed >= mod must be reduced up front, not overflow h*base on the
    // first character: congruent seeds give identical hashes
    val bigSeed = Seq("hello world").toDF("t")
      .select(TextFns.rollingFingerprint($"t", seed = 1000000007L + 7L)).as[Long].head()
    assert(bigSeed == h)
  }

  test("native RollingHash expression == interpreted HOF fold on real documents") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select($"text")
      .union(Seq("päällekkäisyys — ASCII and BMP ümlauts").toDF("text"))
    val diff = docs.select(
        TextFns.rollingFingerprint($"text").as("native"),
        TextFns.rollingFingerprintHof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0, "codegen'd expression must agree with the HOF formulation")
  }

  test("cdc_boundaries: rolling hash == per-window recompute; insertion shifts boundaries locally") {
    import spark.implicits._
    import graft.functions.CdcBoundaries
    val (w, b, m, dv) = (8, 31L, 1000000007L, 64L)
    // reference: recompute each window's fold from scratch
    def reference(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      (w to cps.length).filter { p =>
        cps.slice(p - w, p).foldLeft(0L)((h, c) => (h * b + c) % m) % dv == 0
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps on running through fields",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // degenerate repetition
      "短い非ASCIIのテキスト、絵文字も😀含む繰り返しテスト" * 3, // astral pair
      "x" * 7, // shorter than the window -> no boundaries
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    val df = texts.toDF("t").select(CdcBoundaries($"t").as("bs"))
    val got = df.as[Seq[Int]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == reference(t), s"rolling != recompute for: ${t.take(40)}")
    }
    // content-defined locality: inserting one char at the FRONT shifts
    // every fully-post-insertion boundary by exactly 1
    val base = texts.head
    val shifted = CdcBoundariesOf(spark, "Z" + base)
    assert(shifted.filter(_ > w) == reference(base).map(_ + 1),
      "boundaries past the first window must shift by exactly the insertion length")
  }

  private def CdcBoundariesOf(spark: SparkSession, s: String): Seq[Int] = {
    import spark.implicits._
    Seq(s).toDF("t").select(graft.functions.CdcBoundaries($"t")).as[Seq[Int]].head()
  }

  test("quality score is bounded and monotone-ish in length") {
    import spark.implicits._
    val df = Seq("word", ("the and of to a " * 30).trim).toDF("t")
      .select(TextFns.qualityScore($"t").as("q")).as[Double].collect()
    assert(df.forall(q => q >= 0.0 && q <= 1.0))
    assert(df(1) > df(0))
  }

  test("uniTokens: CJK unigrams, diacritic runs, script boundaries, lowercase-then-classify") {
    import spark.implicits._
    def tok(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFns.uniTokens($"t")).as[Seq[String]].head()
    // mixed scripts split at boundaries; each ideograph is its own token
    assert(tok("spark引擎2026window") == Seq("spark", "引", "擎", "2026window"))
    // diacritics stay IN the run (the ASCII split fragments "café" -> "caf")
    assert(tok("Café Naïve ÉCOLE") == Seq("café", "naïve", "école"))
    // Greek/Cyrillic runs, uppercase folded by the simple mapping
    assert(tok("ΑΛΦΑ και МОСКВА") == Seq("αλφα", "και", "москва"))
    // kana are unigrams too (incl. the prolonged-sound mark)
    assert(tok("データ") == Seq("デ", "ー", "タ"))
    // hangul syllables
    assert(tok("데이터 엔진") == Seq("데", "이", "터", "엔", "진"))
    // punctuation, emoji (astral — codepoint iteration), symbols separate
    assert(tok("a,b🙂c!") == Seq("a", "b", "c"))
    // empties
    assert(tok("") == Seq.empty && tok("!!! ...") == Seq.empty)
  }

  test("uniTokens: pure-CJK text is INVISIBLE to the ASCII tokenizer but not to this one") {
    import spark.implicits._
    val zh = "数据处理引擎"
    val ascii = Seq(zh).toDF("t")
      .select(split(lower($"t"), "[^a-z]+").as("a")).as[Seq[String]].head()
      .filter(_.nonEmpty)
    assert(ascii.isEmpty, "the default tokenizer drops CJK text entirely")
    assert(Seq(zh).toDF("t").select(TextFns.uniTokens($"t")).as[Seq[String]].head()
      == zh.map(_.toString))
  }

  test("unicode shingles + quality score: CJK documents stop scoring as one giant token") {
    import spark.implicits._
    val zh = "数据处理引擎大规模计算"
    val sh = Seq(zh).toDF("t")
      .select(TextFns.shingles($"t", 3, unicode = true)).as[Seq[String]].head()
    assert(sh.size == zh.length - 2 && sh.head == "数 据 处")
    val Seq((qa, qu)) = Seq(zh).toDF("t")
      .select(TextFns.qualityScore($"t").as("a"),
        TextFns.qualityScore($"t", unicode = true).as("u"))
      .as[(Double, Double)].collect().toSeq
    // ASCII mode sees ONE whitespace token; unicode mode sees 10 — the
    // token-count term moves, both stay in [0,1]
    assert(qu > qa && qa >= 0.0 && qu <= 1.0)
  }

  test("script coverage: Hebrew/Arabic/Ukrainian tokenize; unclassified scripts never collide fingerprints") {
    import spark.implicits._
    def tok(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFns.uniTokens($"t")).as[Seq[String]].head()
    // caseless word scripts segment on their own separators
    assert(tok("שלום עולם") == Seq("שלום", "עולם"))
    assert(tok("مرحبا بالعالم") == Seq("مرحبا", "بالعالم"))
    // Cyrillic extensions (U+0450–U+045F): Ukrainian і/ї survive in-run
    assert(tok("Україна Київ") == Seq("україна", "київ"))
    // Thai sits outside every range -> zero tokens; the FINGERPRINT
    // falls back to raw md5, so two distinct unsegmentable docs keep
    // distinct keys (the md5('') collision class, killed for good)
    val th1 = "สวัสดีชาวโลก"
    val th2 = "ทดสอบระบบ"
    assert(tok(th1).isEmpty && tok(th2).isEmpty)
    val fps = Seq(th1, th2, "", "数据").toDF("t")
      .select(TextFns.fingerprintUni($"t")).as[String].collect().toSeq
    assert(fps(0) != fps(1), "distinct unsegmentable docs must not share a fingerprint")
    assert(fps(2) != fps(0) && fps(2) != fps(1), "empty text keeps its own canonical key")
    assert(fps.distinct.size == 4)
  }

  test("uniTokens: segmentation regex replay (UniTok.oracleRegex) agrees via Spark's regexp engine") {
    import spark.implicits._
    // the oracle runs the generated regex in DuckDB/RE2; Java's regex
    // accepts the same \x{...} class syntax, so replaying it HERE pins
    // that the kernel and the generated pattern express one classifier
    // (engine-independent sanity; the q176 gate pins the DuckDB side)
    val texts = Seq(
      "spark引擎2026window", "Café Naïve ÉCOLE", "ΑΛΦΑ και МОСКВА",
      "データパイプラインの設計", "대규모 데이터 엔진", "hello, world! 🙂 #tag",
      "обработка данных в масштабе 42", "")
    // Spark SQL string literals process backslash escapes (DuckDB's do
    // not) — double them so the regex engine sees \x{...} intact
    val pat = graft.functions.UniTok.oracleRegex.replace("\\", "\\\\")
    val rows = texts.toDF("t").select(
      TextFns.uniTokens($"t").as("k"),
      expr(s"filter(regexp_extract_all(lower(t), '$pat', 0), x -> x != '')").as("r"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(texts).foreach { case ((kernel, regex), t) =>
      assert(kernel == regex, s"kernel vs regex diverged on '$t'")
    }
  }

  test("htmlText: hand-computed extraction (blocks, tags, entities, whitespace)") {
    import spark.implicits._
    val cases = Seq(
      ("<html><head><style>.x{a:b}</style><script>if (1 < 2) { x(); }</script></head>" +
        "<body><!-- <p>gone</p> --><p>Hello  <b>world</b></p></body></html>",
        "Hello world"),
      // entity decode order: &amp; LAST, so double-encoded survives as text
      ("&amp;lt; and &lt; and &gt; and &quot;q&quot; and &#39;s&#39; and A&nbsp;B",
        "&lt; and < and > and \"q\" and 's' and A B"),
      // unclosed tag (no '>') survives as literal text
      ("<p>broken <em oops stays", "broken <em oops stays"),
      ("", ""),
      ("<script>all gone</script>", ""),
      // U+000B vertical tab: in the explicit squeeze class (Java \s has
      // it, RE2 \s does not — the shared-constant fix keeps engines equal)
      ("vt\u000Bseparated\u000B here", "vt separated here"))
    val got = cases.map(_._1).toDF("html")
      .select(graft.functions.TextFns.htmlText($"html")).as[String].collect()
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"case $i: got '$g', expected '$e'")
    }
  }

  test("html link stats: nested tags counted as text, commented-out links dead, permille exact") {
    import spark.implicits._
    val html = """<nav><a href="/a">one two</a> <a href="/b"><b>three</b></a></nav>""" +
      """<!-- <a href="/dead">nope</a> --><p>prose here</p>"""
    val df = Seq(html).toDF("html")
      .select(
        graft.functions.TextFns.htmlLinkCount($"html").as("n_links"),
        graft.functions.TextFns.htmlLinkChars($"html").as("link_chars"),
        length(graft.functions.TextFns.htmlText($"html")).cast("long").as("text_chars"))
      .withColumn("permille",
        graft.functions.TextFns.htmlLinkPermille("link_chars", "text_chars"))
    val r = df.collect().head
    assert(r.getAs[Long]("n_links") == 2L)           // the commented one is dead
    assert(r.getAs[Long]("link_chars") == 12L)       // "one two" + "three"
    // text: "one two three prose here" = 24 chars
    assert(r.getAs[Long]("text_chars") == 24L)
    assert(r.getAs[Long]("permille") == 12L * 1000L / 24L)
    // link-only page caps at exactly 1000; empty page at 0
    val edge = Seq("""<a href="/x">only</a>""", "").toDF("html")
      .select(
        graft.functions.TextFns.htmlLinkChars($"html").as("link_chars"),
        length(graft.functions.TextFns.htmlText($"html")).cast("long").as("text_chars"))
      .withColumn("permille",
        graft.functions.TextFns.htmlLinkPermille("link_chars", "text_chars"))
      .select($"permille").as[Long].collect().toSeq
    assert(edge == Seq(1000L, 0L))
  }

  test("gopher repetition primitives: hand-computed line/para dup stats, bullet and ellipsis probes") {
    import spark.implicits._
    // doc: para1 = [aa bb, aa bb, cc] (line 'aa bb' duplicated),
    // para2 = [aa bb] — ALSO a line-level dup ACROSS paragraphs, and
    // para2 exactly equals no other para. Space-padded line trims;
    // tab-prefixed lines keep the tab (TRIM is space-only).
    val text = "aa bb\n  aa bb\ncc\n\naa bb"
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .select(
        TextFns.lineArray($"text").as("lines"),
        TextFns.paraArray($"text").as("paras"))
      .select(
        size($"lines").as("nl"),
        TextFns.dupOccurrences($"lines").as("dl"),
        TextFns.dupExtraChars($"lines").as("dlc"),
        TextFns.arrayChars($"lines").as("lc"),
        size($"paras").as("np"),
        TextFns.dupOccurrences($"paras").as("dp"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 4, "4 non-empty trimmed lines")
    assert(r.getLong(1) == 2L, "'aa bb' occurs 3x -> 2 beyond-first occurrences")
    assert(r.getLong(2) == 10L, "2 extra occurrences x 5 chars")
    assert(r.getLong(3) == 5L * 3 + 2, "total line chars")
    assert(r.getInt(4) == 2 && r.getLong(5) == 0L, "paragraphs differ (embedded newlines in the key)")

    // tab is content: the two '\tx' lines are dups with len 2 each
    val tab = Seq((1L, "\tx\n\tx")).toDF("doc_id", "text")
      .select(TextFns.lineArray($"text").as("l"))
      .select(TextFns.dupOccurrences($"l"), TextFns.dupExtraChars($"l")).collect()(0)
    assert(tab.getLong(0) == 1L && tab.getLong(1) == 2L)

    // bullet and ellipsis probes, incl. the sub-3-char suffix guard
    val probe = Seq((1L, "- a\n* b\n• c\n-x\nfoo ...\n..\nbar...")).toDF("doc_id", "text")
      .select(TextFns.lineArray($"text").as("l"))
      .select(TextFns.bulletLines($"l"), TextFns.ellipsisLines($"l")).collect()(0)
    assert(probe.getLong(0) == 3L, "'-x' (no space) is not a bullet; '- ', '* ', '•' are")
    assert(probe.getLong(1) == 2L, "'..' is too short for the suffix probe; 'foo ...' and 'bar...' end in it")

    // empty + whitespace-only: zero segments, zero chars, no NULLs
    val empty = Seq((1L, ""), (2L, " \n\n  \n")).toDF("doc_id", "text")
      .select($"doc_id", TextFns.lineArray($"text").as("l"))
      .select($"doc_id", size($"l").as("n"), TextFns.arrayChars($"l").as("c"),
        TextFns.dupExtraChars($"l").as("d"))
      .orderBy($"doc_id").collect()
    empty.foreach { r =>
      assert(r.getInt(1) == 0 && r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
  }

  test("htmlTextLines == independent per-segment strip fold over generated and adversarial pages") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // independent reimplementation of the contract: split the
    // blocks-removed page on <br> variants, per segment strip tags,
    // decode entities in table order, squeeze the explicit whitespace
    // class, trim; rejoin on newline
    def stripRef(seg: String): String = {
      var t = seg.replaceAll("(?s)<[^>]*>", " ")
      graft.functions.TextFns.HtmlEntities.foreach { case (e, r) =>
        t = t.replace(e, r)
      }
      t.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ")
        .replaceAll("^ | $", "").replaceAll("^ | $", "")
    }
    def linesRef(html: String): String = {
      val noBlocks = html
        .replaceAll("(?s)<!--.*?-->", " ")
        .replaceAll("(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
        .replaceAll("(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
      noBlocks.split("(?i)<br([ \\t\\n\\x0B\\f\\r][^>]*)?/?>", -1)
        .map(stripRef).mkString("\n")
    }
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val pieces = Vector("plain words here", "  spaced  ", "<b>bold</b>",
      "&amp;lt;", "<br>", "<BR/>", "<br />", "<script>var x = 1 < 2; // <br> inside</script>",
      "<!-- <br> commented out { } -->", "多字节 text", "tab\there",
      "<a href=x>link text</a>", "&quot;quoted&quot;", "",
      "<br clear=\"all\">", "<BR CLEAR=left />", "<brew>kettle</brew>")
    val pages = (0 until 120).map { i =>
      val n = 3 + (mix(i).abs % 8).toInt
      val body = (0 until n)
        .map(j => pieces((mix(i * 131 + j).abs % pieces.size).toInt))
        .mkString(" ")
      (i.toLong, s"<html><head><script>hidden<br></script></head><body>$body</body></html>")
    } ++ Seq(
      (900L, ""),
      (901L, "<br><br><br>"),                       // empty segments survive as empty lines
      (902L, "no markup at all"),
      (903L, "<script>all hidden<br></script>"),    // block strip before the split
      // ADVICE r16: an attribute-carrying <br> is still a line break —
      // before the pattern widened it fell through to tag stripping and
      // silently MERGED the two authored lines
      (904L, "first authored line.<br clear=\"all\">second authored line."),
      (905L, "a<BR CLEAR=left />b<br\n>c"),
      (906L, "the <brew>kettle</brew> boils"))      // <brew> is NOT a break
    val got = pages.toDF("doc_id", "html")
      .select($"doc_id", graft.functions.TextFns.htmlTextLines($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pages.foreach { case (id, html) =>
      assert(got(id) == linesRef(html), s"doc $id:\n[${got(id)}]\n[${linesRef(html)}]")
    }
    // the attributed-<br> contract directly (not just fold equality):
    // two authored lines stay two lines, and <brew> is not a break
    assert(got(904L) == "first authored line.\nsecond authored line.")
    assert(got(905L) == "a\nb\nc")
    assert(got(906L) == "the kettle boils")
    // and the round-trip contract the capstone relies on: clean
    // single-spaced trimmed lines joined by <br> come back verbatim
    val lines = Seq("first line here.", "second line.", "third one!")
    val wrapped = "<p>" + lines.mkString("<br>") + "</p>"
    assert(got.nonEmpty) // keep the map referenced
    val rt = Seq((0L, wrapped)).toDF("doc_id", "html")
      .select(graft.functions.TextFns.htmlTextLines(col("html")))
      .collect().head.getString(0)
    assert(rt == lines.mkString("\n"), rt)
  }
}
