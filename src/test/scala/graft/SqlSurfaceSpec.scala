package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SqlSurface

class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame plan results") {
    val viaSql = SqlSurface.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaDf = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("custom functions are registered in the SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(3.0d, 2.0d, 1.0d))")
      .collect()(0).getDouble(0)
    assert(dot == 10.0)
    graft.queries.SqlSurface.registerViews(spark, sf)
    val sig = spark.sql(
      "SELECT minhash_sketch(xxhash64(text), 16) FROM documents")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 16 && sig.forall(_ != Long.MaxValue))
    val rh = spark.sql("SELECT rolling_hash('hello world')")
      .collect()(0).getLong(0)
    assert(rh == 234728892L) // pinned value, same fold as the Column API
    // cdc_boundaries: SQL registration == Column API on the same text
    import spark.implicits._
    val txt = "the quick brown fox jumps over the lazy dog and keeps on running"
    val viaSql = spark.sql(s"SELECT cdc_boundaries('$txt')")
      .collect()(0).getSeq[Int](0)
    val viaCol = Seq(txt).toDF("t")
      .select(graft.functions.CdcBoundaries($"t")).as[Seq[Int]].head()
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // bitmap_distinct: exact distinct through SQL == COUNT(DISTINCT)
    val bd = spark.sql(
      "SELECT bitmap_distinct(doc_id), COUNT(DISTINCT doc_id) FROM documents").head()
    assert(bd.getLong(0) == bd.getLong(1) && bd.getLong(0) > 0)
    // unicode_tokens: SQL registration == Column API (CJK + diacritics)
    val utxt = "Café引擎2026"
    val utSql = spark.sql(s"SELECT unicode_tokens('$utxt')")
      .collect()(0).getSeq[String](0)
    val utCol = Seq(utxt).toDF("t")
      .select(graft.functions.TextFns.uniTokens($"t")).as[Seq[String]].head()
    assert(utSql == utCol && utSql == Seq("café", "引", "擎", "2026"))
    // bpe_encode / bpe_byte_encode: SQL == Column API on the same text
    val btxt = "on the mat"
    val bRow = spark.sql(s"SELECT bpe_encode('$btxt'), bpe_byte_encode('$btxt')").head()
    val bCol = Seq(btxt).toDF("t")
      .select(graft.operators.Bpe.encode($"t"), graft.operators.Bpe.encodeBytes($"t"))
      .head()
    assert(bRow.getString(0) == bCol.getString(0))
    assert(bRow.getString(1) == bCol.getString(1) &&
      bRow.getString(1).split(" ").contains("2074686520"))
    // html_text / html_link_count: the Bridge round-trip registration IS
    // the Column chain, so SQL == Column API by construction — pin it
    // anyway on a doc with blocks, entities, and an anchor
    val htxt = "<p>Hi <a href=\"/x\">there &amp; back</a></p><script>no()</script>"
    val hRow = spark.sql(s"SELECT html_text('${htxt.replace("'", "''")}'), " +
      s"html_link_count('${htxt.replace("'", "''")}')").head()
    val hCol = Seq(htxt).toDF("t")
      .select(graft.functions.TextFns.htmlText($"t"),
        graft.functions.TextFns.htmlLinkCount($"t")).head()
    assert(hRow.getString(0) == hCol.getString(0) && hRow.getString(0) == "Hi there & back")
    assert(hRow.getLong(1) == hCol.getLong(1) && hRow.getLong(1) == 1L)
    // pii_redact: SQL registration == Column API on a doc carrying all
    // three PII types plus the ordering edge (E.164-looking local part)
    val ptxt = "mail a@b.co ip 8.8.8.8 tel +12345678 and +1234567@relay.example.org"
    val pSql = spark.sql(s"SELECT pii_redact('$ptxt')").head().getString(0)
    val pCol = Seq(ptxt).toDF("t")
      .select(graft.functions.PiiFns.redact($"t")).head().getString(0)
    assert(pSql == pCol &&
      pSql == "mail <EMAIL> ip <IP> tel <PHONE> and <EMAIL>")
    // ...and byte-equal over the ENTIRE PII fixture: the registration
    // parses redactSqlText (a second rendering of the same Stages +
    // Luhn constants), so this full-corpus equality is what makes the
    // dual rendering safe — any drift fails here, card and IBAN edges
    // included
    val fx = spark.read
      .parquet(graft.queries.CurationQueries.PiiFixture.ensure(spark))
    fx.createOrReplaceTempView("pii_fixture_docs")
    val both = spark.sql("SELECT doc_id, pii_redact(text) AS r FROM pii_fixture_docs")
      .join(fx.select($"doc_id", graft.functions.PiiFns.redact($"text").as("c")),
        Seq("doc_id"))
    assert(both.count() >= 1200L)
    assert(both.filter($"r" =!= $"c").count() == 0L,
      "SQL pii_redact diverged from the Column chain somewhere in the fixture")
    // url_canonical: SQL registration == Column API on the
    // everything-at-once fixture edge (case, default port, tracking
    // param, fragment)
    val uurl = "HtTp://MiXeD.CaSe.Org:80/KeepCase?utm_source=a#f"
    val uSql = spark.sql(s"SELECT url_canonical('$uurl')").head().getString(0)
    val uCol = graft.functions.UrlFns
      .canonicalFrame(Seq((1L, uurl)).toDF("id", "url"), "id", "url")
      .head().getString(1)
    assert(uSql == uCol && uSql == "http://mixed.case.org/KeepCase")
  }

  test("events view carries the normalized timestamp (SQL == DataFrame surface)") {
    // regression pin: registerViews must route events through
    // Tables.events — the raw reader exposes ts as int64 nanos and
    // date_trunc SQL would fail or silently diverge
    val viaSql = SqlSurface.sql(spark, sf,
      """SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin).collect()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaDf = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"h").collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaDf.toSeq)
  }

  test("SQL joins and subqueries work over the views") {
    val n = SqlSurface.sql(spark, sf,
      """SELECT COUNT(*) FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey
        |              AND l_quantity > 45)""".stripMargin)
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("join hints are honored: MERGE forces sort-merge where broadcast would win, BROADCAST forces it back") {
    // the hint surface is how a user overrides the planner when runtime
    // knowledge beats statistics (e.g. a 'small' dim that explodes after
    // a generator join) — both directions pinned on the executed plan
    val merged = SqlSurface.sql(spark, sf,
      """SELECT /*+ MERGE(n) */ COUNT(*)
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin)
    merged.collect()
    val mp = merged.queryExecution.executedPlan.toString
    assert(mp.contains("SortMergeJoin") && !mp.contains("BroadcastHashJoin"),
      s"MERGE hint ignored:\n${mp.take(600)}")
    val bcast = SqlSurface.sql(spark, sf,
      """SELECT /*+ BROADCAST(n) */ COUNT(*)
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin)
    bcast.collect()
    val bp = bcast.queryExecution.executedPlan.toString
    assert(bp.contains("BroadcastHashJoin"), s"BROADCAST hint ignored:\n${bp.take(600)}")
  }
}
