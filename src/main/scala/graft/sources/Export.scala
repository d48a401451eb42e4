package graft.sources

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines export sinks with schema-checked read-back.
  *
  * The lake's interchange formats for downstream consumers that can't
  * read parquet (spreadsheets, legacy loaders, labeling tools). Both
  * sinks are verified by ROUND-TRIP: the oracle rows (q118/q119) write
  * a frame containing deliberately hostile values — embedded quotes,
  * commas, newlines, NULLs, shortest-repr doubles — read it back
  * through the matching source with an explicit schema, and
  * hash-compare against DuckDB computing the same expressions straight
  * from parquet. Anything the text format mangles (quoting, escaping,
  * null-vs-empty, double formatting) becomes a gate failure.
  *
  * Scale notes, pinned here because they differ per format:
  *   - CSV with embedded newlines needs `multiLine=true` on read,
  *     which makes files NON-SPLITTABLE (one task per file). Export
  *     shards into many files (one per task) so parallelism survives,
  *     but JSON-lines is the preferred text interchange at 100 TB:
  *     JSON escapes newlines as `\n`, so every line is a record and
  *     every file splits.
  *   - Doubles cross both formats via the JVM's shortest-repr
  *     `Double.toString`, which round-trips bit-exactly by contract.
  *   - CSV cannot distinguish NULL from empty string without a
  *     sentinel; the round-trip keeps string columns non-empty and
  *     lets numeric NULLs travel as empty fields.
  */
object Export {

  /** Deterministic scratch dir per (format, source dir) under the JVM
    * tmpdir; each export overwrites it, so replays are idempotent.
    */
  def scratchDir(format: String, sourceDir: String): String = {
    val tag = sourceDir.replaceAll("[^A-Za-z0-9]+", "_")
    new File(System.getProperty("java.io.tmpdir"),
      s"graft_export_${format}_$tag").getAbsolutePath
  }

  /** Write `df` as quoted CSV with header and read it back with the
    * writer's schema. `multiLine` read handles embedded newlines.
    */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    val schema: StructType = df.schema
    df.write.mode("overwrite")
      .option("header", "true")
      // quote all strings so embedded delimiters/newlines are unambiguous;
      // escape " by doubling (the RFC-4180 convention DuckDB also reads)
      .option("quoteAll", "true")
      .option("escape", "\"")
      .csv(path)
    df.sparkSession.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
  }

  /** Write `df` as JSON lines and read it back with the writer's
    * schema. Newlines/quotes are escaped per JSON, so files stay
    * line-delimited and splittable — the scale-preferred text format.
    */
  def jsonRoundTrip(df: DataFrame, path: String): DataFrame = {
    val schema: StructType = df.schema
    df.write.mode("overwrite").json(path)
    df.sparkSession.read.schema(schema).json(path)
  }
}
