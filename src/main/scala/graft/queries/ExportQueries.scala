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
      doc = "JSON-lines sink+source round-trip over the same hostile values: JSON escaping keeps every record on one line, so files stay splittable — the preferred 100 TB text interchange; schema-checked read-back, NULL field omission, exact double round-trip.")
  )
}
