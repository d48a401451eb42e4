package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PiiFns
import graft.queries.CurationQueries.PiiFixture

/** PII scrub tier: hand-computed counts and redactions on the fixture
  * edge docs (every boundary decision documented in PiiFns), the
  * no-residual guarantee over the whole fixture, and a distributed run
  * over the real documents corpus.
  */
class PiiSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val frame = {
    import spark.implicits._
    PiiFns.piiFrame(spark.read.parquet(PiiFixture.ensure(spark)), "doc_id", "text")
      .filter($"doc_id" >= 2000L).cache()
  }

  test("hand-computed counts on the edge docs pin every boundary decision") {
    import spark.implicits._
    val counts = frame
      .select($"doc_id", $"email_count", $"ip_count", $"phone_count", $"ssn_count",
        $"iban_count", $"cc_count")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val expected = Map(
      2000L -> ((0L, 0L, 0L, 0L, 0L, 0L)), // empty doc
      2001L -> ((0L, 0L, 0L, 0L, 0L, 0L)), // missing domain dot / missing TLD
      2002L -> ((1L, 0L, 0L, 0L, 0L, 0L)), // multi-dot host is ONE email
      2003L -> ((0L, 1L, 0L, 0L, 0L, 0L)), // octets not range-checked (published-regex fidelity)
      2004L -> ((0L, 1L, 0L, 0L, 0L, 0L)), // 1.2.3 misses; 1.2.3.4.5 matches first four
      2005L -> ((0L, 0L, 0L, 0L, 0L, 0L)), // v1.2.3.4: no \b between 'v' and '1'
      2006L -> ((0L, 0L, 2L, 0L, 0L, 0L)), // 6 digits too short; 7 ok; 16 caps at 15
      2007L -> ((0L, 0L, 3L, 0L, 0L, 0L)), // all three NANP separators (-, ., space)
      2008L -> ((0L, 1L, 0L, 0L, 0L, 0L)), // IP-literal email host -> IP stage
      2009L -> ((1L, 0L, 0L, 0L, 0L, 0L)), // E.164-looking local part: email ONLY (order pin)
      2010L -> ((1L, 1L, 1L, 0L, 0L, 0L)), // one each of the original three
      2011L -> ((0L, 0L, 0L, 0L, 0L, 0L)), // already-redacted tokens count zero
      2012L -> ((1L, 0L, 0L, 0L, 0L, 0L)), // trailing sentence dot excluded from match
      2013L -> ((0L, 0L, 1L, 0L, 0L, 0L)), // tab/VT-adjacent E.164 still matches
      2014L -> ((0L, 0L, 1L, 1L, 0L, 0L)), // 3-2-4 SSN vs 3-3-4 phone never collide
      2015L -> ((0L, 0L, 0L, 0L, 0L, 1L)), // Luhn decides: valid redacts, off-by-one survives
      2016L -> ((0L, 0L, 0L, 0L, 0L, 3L)), // grouped, dashed, and mixed-separator 4-4-4-4 forms
      2017L -> ((0L, 0L, 0L, 0L, 0L, 0L)), // 12 digits too short, 21 digits never a candidate
      2018L -> ((0L, 0L, 0L, 0L, 0L, 2L)), // 19- and 13-digit valid cards (the length envelope)
      2019L -> ((0L, 0L, 0L, 0L, 1L, 0L)), // IBAN shape: uppercase-only, length floor pinned
      2020L -> ((0L, 0L, 0L, 0L, 0L, 1L)), // embedded-in-21-digit-run occurrence not counted/touched
      2021L -> ((0L, 0L, 0L, 0L, 1L, 0L))) // IBAN tail never double-counted as a card (order pin)
    expected.foreach { case (id, exp) =>
      assert(counts(id) == exp, s"doc $id: got ${counts(id)}, want $exp")
    }
  }

  test("redacted text is byte-exact on the tricky docs and leaves non-PII intact") {
    import spark.implicits._
    val red = frame.select($"doc_id", $"redacted")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(2006L) ==
      "+123456 too short, <PHONE> matches, <PHONE>6 caps at fifteen")
    assert(red(2008L) == "ip-literal user@<IP> is host-redacted as ip")
    assert(red(2009L) == "phone-looking local part <EMAIL> counts once as email")
    assert(red(2012L) == "trailing-dot email <EMAIL>. ends the sentence")
    assert(red(2011L) ==
      "already-redacted <EMAIL> <IP> <PHONE> tokens count zero")
    assert(red(2015L) ==
      "pay with <CC> but 4111111111111112 fails the checksum")
    assert(red(2016L) == "grouped <CC> and dashed <CC> and mixed <CC> all redact")
    assert(red(2019L) ==
      "iban <IBAN> redacts but gb82west12345698765432 lowercase and DE0012345 short survive")
    assert(red(2020L) ==
      "embedded 994111111111111111299 untouched while <CC> alone redacts")
    assert(red(2021L) == "acct <IBAN> is an iban shape never a card")
  }

  test("residual scan over redacted text is zero across the ENTIRE fixture") {
    import spark.implicits._
    val full = PiiFns.piiFrame(
      spark.read.parquet(PiiFixture.ensure(spark)), "doc_id", "text")
    assert(full.filter($"residual_pii" =!= 0L).count() == 0L)
    // and the planted cycles actually planted: a fixture where nothing
    // matches would vacuously pass everything above
    val totals = full.selectExpr("sum(email_count)", "sum(ip_count)",
      "sum(phone_count)", "sum(ssn_count)", "sum(iban_count)", "sum(cc_count)")
      .collect()(0)
    assert(totals.getLong(0) >= 200L && totals.getLong(1) >= 100L &&
      totals.getLong(2) >= 150L && totals.getLong(3) >= 60L &&
      totals.getLong(4) >= 40L && totals.getLong(5) >= 50L,
      s"planted volume too low: $totals")
  }

  test("generative: planted PII is counted exactly and never survives redaction (500 random docs)") {
    import spark.implicits._
    // metamorphic pin beyond the hand-built fixture: random docs with a
    // KNOWN number of planted, token-isolated PII items of each class
    // among pure-alpha noise (which can never false-hit) — the frame
    // must count exactly the plants and the residual must be zero.
    // Deterministic seed: the corpus is reproducible across runs.
    val rnd = new scala.util.Random(20260815L)
    def alpha(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def email() = s"${alpha(3 + rnd.nextInt(6))}@${alpha(3 + rnd.nextInt(5))}.${alpha(2 + rnd.nextInt(3))}"
    def ip() = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
    def phone() = if (rnd.nextBoolean()) "+" + (0 until 7 + rnd.nextInt(9)).map(_ => rnd.nextInt(10)).mkString
      else f"${100 + rnd.nextInt(900)}%d-${100 + rnd.nextInt(900)}%d-${1000 + rnd.nextInt(9000)}%d"
    def ssn() = f"${100 + rnd.nextInt(900)}%d-${10 + rnd.nextInt(90)}%d-${1000 + rnd.nextInt(9000)}%d"
    def luhnBody(n: Int) = (0 until n).map(_ => rnd.nextInt(10)).mkString
    def luhnCheck(body: String) = {
      val sum = body.reverse.zipWithIndex.map { case (ch, idx) =>
        val d = ch - '0'
        if (idx % 2 == 0) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
      ((10 - sum % 10) % 10).toString
    }
    // valid card: computed check digit; invalid: check digit bumped —
    // Luhn's valid check digit is unique, so the bump always invalidates
    def card(valid: Boolean) = {
      val body = luhnBody(12 + rnd.nextInt(7))
      val c = luhnCheck(body)
      body + (if (valid) c else ((c.toInt + 1 + rnd.nextInt(9)) % 10).toString)
    }
    def iban() = s"${alpha(2).toUpperCase}${10 + rnd.nextInt(90)}${(0 until 11 + rnd.nextInt(20)).map(_ => "ABCDEFGHJKMNPQRSTUVWXYZ0123456789"(rnd.nextInt(33))).mkString}"
    val docs = (0 until 500).map { i =>
      val ne = rnd.nextInt(3); val ni = rnd.nextInt(3)
      val np = rnd.nextInt(3); val ns = rnd.nextInt(3)
      val nc = rnd.nextInt(3); val nb = rnd.nextInt(3)
      val nInvalid = rnd.nextInt(3) // Luhn-invalid plants: must NOT count
      val planted = Seq.fill(ne)(email()) ++ Seq.fill(ni)(ip()) ++
        Seq.fill(np)(phone()) ++ Seq.fill(ns)(ssn()) ++
        Seq.fill(nc)(card(valid = true)) ++ Seq.fill(nb)(iban()) ++
        Seq.fill(nInvalid)(card(valid = false))
      val noise = Seq.fill(5 + rnd.nextInt(10))(alpha(3 + rnd.nextInt(7)))
      val text = rnd.shuffle(planted ++ noise).mkString(" ")
      (i.toLong, text, Seq(ne, ni, np, ns, nb, nc).map(_.toLong))
    }
    val expected = docs.map(d => d._1 -> d._3).toMap
    val out = PiiFns.piiFrame(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"email_count", $"ip_count", $"phone_count",
        $"ssn_count", $"iban_count", $"cc_count", $"residual_pii")
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val got = (1 to 6).map(r.getLong(_)).toSeq
      assert(got == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: counted $got, planted ${expected(r.getLong(0))}")
      assert(r.getLong(7) == 0L, s"doc ${r.getLong(0)}: residual PII after redaction")
    }
  }

  test("runs distributed over the documents corpus; prose carries no false hits") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = PiiFns.piiFrame(docs, "doc_id", "text")
    assert(out.count() == 500L)
    // the synthetic corpus is word-salad prose — the precision-first
    // patterns must not fire on it
    assert(out.filter($"has_pii" =!= 0L).count() == 0L)
  }
}
