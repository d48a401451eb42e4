package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Export

/** Text-interchange sink/source rows: CSV and JSON-lines round-trips
  * over deliberately hostile values, oracle-compared against DuckDB
  * computing the same expressions straight from parquet. See
  * [[graft.sources.Export]] for the format-level scale notes.
  *
  * The "tricky" column is constructed to contain a double-quote, a
  * comma, and an embedded newline in EVERY row — the three characters
  * that break naive CSV — plus a numeric column that is NULL on a
  * deterministic subset (null-vs-empty round-trip) and a shortest-repr
  * double. The corpus itself contains none of these characters (checked),
  * so the row injects them; both engines apply the identical transform,
  * and only the Spark side pays the sink+source trip.
  */
object ExportQueries {

  // '"' + first 20 chars + ',' + newline + 'end' — quote, comma, newline
  private def trickyCol = concat(
    lit("\""), substring(col("text"), 1, 20), lit(","), lit("\n"), lit("end"))

  private val trickySql =
    """'"' || SUBSTR(text, 1, 20) || ',' || CHR(10) || 'end'"""

  /** The q218 page template — ONE constant pair interpolated into both
    * the Spark mux and the DuckDB oracle (no single quotes: the SQL
    * embeds them verbatim). Carries a script block and two nav anchors
    * so the extraction chain has real work on every page. Defined
    * BEFORE `queries`: the oracle string interpolates these at object
    * initialization, so a definition below the `queries` val would
    * capture null (the bug the first q218 run caught).
    */
  private[graft] val PagePrefix: String =
    "<html><head><title>doc page</title><script>var x = 1;</script></head>" +
      "<body><nav><a href=\"/home\">home</a> <a href=\"/about\">about</a></nav><p>"
  private[graft] val PageSuffix: String = "</p></body></html>"

  private def exported(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        trickyCol.as("tricky"),
        length(col("text")).cast("long").as("len"),
        when(col("doc_id") % 5 === 0, lit(null).cast("long"))
          .otherwise(length(col("text")).cast("long")).as("maybe"),
        (length(col("text")) / lit(7.0d)).as("dbl"))

  private val oracleBody = s"""
        SELECT doc_id,
               $trickySql AS tricky,
               CAST(LENGTH(text) AS BIGINT) AS len,
               CASE WHEN doc_id % 5 = 0 THEN NULL
                    ELSE CAST(LENGTH(text) AS BIGINT) END AS maybe,
               LENGTH(text) / 7.0::DOUBLE AS dbl
        FROM documents
        ORDER BY doc_id"""

  val queries: Seq[Q] = Seq(
    Q(
      "q118_csv_roundtrip",
      (s, d) => Export.csvRoundTrip(exported(s, d), Export.scratchDir("csv", d))
        .orderBy(col("doc_id")),
      Some(oracleBody),
      doc = "CSV sink+source round-trip: quoted RFC-4180 CSV (quote-doubling escape, multiLine read) preserves embedded quotes/commas/newlines, numeric NULLs and shortest-repr doubles bit-exactly — the oracle computes the same expressions from parquet, so any format mangling is a hash mismatch."),

    Q(
      "q119_json_roundtrip",
      (s, d) => Export.jsonRoundTrip(exported(s, d), Export.scratchDir("json", d))
        .orderBy(col("doc_id")),
      Some(oracleBody),
      doc = "JSON-lines sink+source round-trip over the same hostile values: JSON escaping keeps every record on one line, so files stay splittable — the preferred 100 TB text interchange; schema-checked read-back, NULL field omission, exact double round-trip."),

    Q(
      "q134_zorder_layout",
      (s, d) => {
        import s.implicits._
        // Z-ORDER (Morton) multi-dimensional clustering — the layout
        // operator behind OPTIMIZE ZORDER: interleave two range-reduced
        // dimensions into one sort/bucket key (five codegen'd bitwise
        // ops per coordinate, no UDF), then report each z-bucket's zone
        // map (min/max of BOTH dimensions). At 100 TB these buckets are
        // files: a predicate on EITHER column prunes by the emitted
        // min/max — impossible under single-column ordering, where the
        // secondary dimension's per-file range spans the whole domain
        // (LayoutSpec quantifies exactly that gap). Pure integer
        // arithmetic; the oracle replays the identical shift cascade.
        val z = Tables.lineitem(s, d)
          .select(($"l_partkey" % 1024).as("x"), ($"l_suppkey" % 1024).as("y"))
          .withColumn("zv", graft.operators.Layout.mortonKey($"x", $"y"))
        z.groupBy(shiftright($"zv", 14).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"))
          .orderBy($"bucket")
      },
      Some("""
        WITH pts AS (
          SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
        a AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xs,
                           (y | (y << 8)) & 16711935 AS ys FROM pts),
        b AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs,
                           (ys | (ys << 4)) & 252645135 AS ys FROM a),
        c AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs,
                           (ys | (ys << 2)) & 858993459 AS ys FROM b),
        e AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs,
                           (ys | (ys << 1)) & 1431655765 AS ys FROM c),
        z AS (SELECT x, y, xs | (ys << 1) AS zv FROM e)
        SELECT zv >> 14 AS bucket, COUNT(*) AS n,
               MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(y) AS min_y, MAX(y) AS max_y
        FROM z GROUP BY 1 ORDER BY bucket"""),
      doc = "Z-order (Morton) clustering key as five codegen'd bitwise ops per coordinate: bucket by the interleaved key and emit each bucket's two-dimensional zone map — the data-skipping layout where predicates on EITHER column prune files; oracle replays the identical shift cascade bit-for-bit."),

    Q(
      "q217_warc_ingest",
      (s, d) => {
        import s.implicits._
        // WARC SOURCE — the container a 100 TB pipeline actually starts
        // from: CommonCrawl ships crawl shards as .warc.gz, per-record
        // gzip members concatenated into one file. The engine muxes the
        // documents table into real shards (WARC/1.0 records, ISO 28500
        // CRLF framing, hand-rolled gzip member framing) and demuxes
        // them back with every frame verified (member magic/FLG/CRC32/
        // ISIZE, version line, Content-Length fill, the mandated
        // CRLF CRLF record trailer) — the q40/q50 codec-oracle trick on
        // a SOURCE format: DuckDB predicts every parsed field from the
        // text alone, so any header, length, boundary, or compression
        // bug is a hash mismatch. Content-Length is UTF-8 BYTES
        // (STRLEN, not LENGTH — the zh docs make the difference real).
        // Deployment shape: the blobs are files — binaryFile scan →
        // flatMap(parseShard) is an embarrassingly parallel per-file
        // scalar demux, no shuffle before curation; the in-engine mux
        // (one groupByKey over the fixture) exists only so the oracle
        // can see through the round trip.
        val docs = Tables.documents(s, d).select($"doc_id", $"text").as[(Long, String)]
        // floorDiv, not /: the oracle buckets with DuckDB`s // (floor), and the
        // two diverge on negative ids
        val shards = docs.groupByKey(d => Math.floorDiv(d._1, 10L)).mapGroups { (sid, it) =>
          (sid, graft.sources.Warc.buildShard(it.toSeq.sortBy(_._1)))
        }
        shards.flatMap { case (sid, blob) =>
          graft.sources.Warc.parseShard(blob).map { r =>
            (sid, r.url.substring(r.url.lastIndexOf('/') + 1).toLong,
              r.url, r.contentLength, r.payload)
          }
        }.toDF("shard_id", "doc_id", "url", "content_length", "payload")
          .select($"shard_id", $"doc_id", $"url", $"content_length",
            md5($"payload").as("payload_md5"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT CAST(doc_id // 10 AS BIGINT) AS shard_id, doc_id,
               '${graft.sources.Warc.UrlPrefix}' || CAST(doc_id AS VARCHAR) AS url,
               CAST(STRLEN(text) AS BIGINT) AS content_length,
               MD5(text) AS payload_md5
        FROM documents
        ORDER BY doc_id"""),
      doc = "WARC (.warc.gz) crawl-shard ingestion, pure JVM both ways: mux documents into WARC/1.0 records wrapped in per-record gzip members (the CommonCrawl seekable-shard format), demux with every frame verified loudly (member magic/FLG/CRC32/ISIZE, version line, Content-Length fill, CRLF CRLF record trailer) — oracle predicts shard, target URI, byte-exact Content-Length, and payload md5 from the source text, so any codec bug breaks the gate; deployment is binaryFile scan + per-file scalar demux, no shuffle."),

    Q(
      "q218_crawl_ladder",
      (s, d) => {
        import s.implicits._
        // THE FULL CRAWL-TO-TEXT LADDER in one oracle-gated pass:
        // WARC member → HTTP response → HTML page → extracted text +
        // link-density signal — the exact front-end every web corpus
        // (C4, CCNet, RefinedWeb, FineWeb) runs before curation, with
        // every layer's framing verified loudly on the way down. The
        // oracle sees through the container layers because mux/demux
        // are exact inverses (q217's and parseHttp's byte gates prove
        // it): DuckDB wraps the source text in the SAME page template
        // (one constant pair, interpolated) and replays the q191
        // extraction chain (HtmlOracleSql — shared, so q191 and this
        // row can never drift), predicting link counts, byte-exact
        // text length, integral-permille link density, and the
        // extracted-text md5 with three container formats in between.
        // Scale shape: the mux groupByKey exists only so the oracle
        // can see through the round trip; deployment is binaryFile
        // scan → flatMap(parseShard) → parseHttp → htmlExtract, a
        // per-file scalar demux plus codegen'd scalar extraction —
        // no shuffle before curation at any corpus size.
        val docs = Tables.documents(s, d).select($"doc_id", $"text").as[(Long, String)]
        // floorDiv, not /: the oracle buckets with DuckDB`s // (floor), and the
        // two diverge on negative ids
        val shards = docs.groupByKey(d => Math.floorDiv(d._1, 10L)).mapGroups { (sid, it) =>
          val recs = it.toSeq.sortBy(_._1).map { case (id, text) =>
            (id, graft.sources.Warc.httpMessage(PagePrefix + text + PageSuffix))
          }
          (sid, graft.sources.Warc.buildShard(recs))
        }
        val pages = shards.flatMap { case (_, blob) =>
          graft.sources.Warc.parseShard(blob).map { r =>
            val http = graft.sources.Warc.parseHttp(r.payload)
            (r.url.substring(r.url.lastIndexOf('/') + 1).toLong, http.body)
          }
        }.toDF("doc_id", "html")
        graft.functions.TextFns.htmlExtract(pages, "doc_id", "html")
          .select($"doc_id", $"n_links", $"link_chars", $"text_chars",
            $"link_permille", md5($"text").as("text_md5"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH page AS (
          SELECT doc_id, '$PagePrefix' || text || '$PageSuffix' AS html
          FROM documents),
        ex AS (
          SELECT doc_id,
                 ${TextQueries.HtmlOracleSql.stripped("html")} AS text,
                 ${TextQueries.HtmlOracleSql.linkCols("html")}
          FROM page)
        SELECT doc_id, n_links, link_chars,
               CAST(LENGTH(text) AS BIGINT) AS text_chars,
               CAST(CASE WHEN LENGTH(text) > 0
                    THEN (link_chars * 1000) // LENGTH(text) ELSE 0 END AS BIGINT) AS link_permille,
               MD5(text) AS text_md5
        FROM ex
        ORDER BY doc_id"""),
      doc = "The full crawl-to-text ladder end to end: WARC gzip members → HTTP/1.1 response parse (status grammar + Content-Length body verification) → HTML page → q191 extraction chain, in one pass with every container frame verified loudly — the oracle wraps the source text in the same one-constant page template and replays the shared extraction SQL, predicting link counts, text length, link density, and extracted-text md5 through three container formats; deployment is a per-file scalar demux + codegen'd extraction, no shuffle before curation.")
  )
}
