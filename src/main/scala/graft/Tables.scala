package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata lake
  * (see TESTDATA.md). One parquet file per table under `dir`.
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning:
  * filters and projections in downstream queries reach the scan
  * (`PushedFilters` / `ReadSchema` in .explain).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Loaded-DataFrame memo per (session, file path, path mtime) —
  // METADATA reuse, not data caching: `spark.read.parquet` eagerly lists
  // the path and reads the footer schema on every call, so a registry
  // where each of ~230 queries re-loads its tables per execution pays
  // that driver-side work hundreds of times per bench pass (measured
  // 50-150 ms per table). A DataFrame is an immutable plan; handing
  // every caller the same analyzed relation changes no results and keeps
  // full pushdown/pruning (each query still plans its own scan from the
  // shared relation). The mtime key makes the memo overwrite-safe: a
  // re-written table dir (mode("overwrite") recreates the root, so its
  // mtime moves) misses the memo and re-lists instead of serving the
  // old file set back (FILE_NOT_EXIST — the MixingSpec q224 shape); the
  // staleness check is ONE stat call, not a listing. Bounded:
  // |dirs seen| × |tables| live entries plus overwritten-generation
  // leftovers, nothing persisted.
  private val loadCache = scala.collection.mutable.Map
    .empty[(SparkSession, String, java.nio.file.attribute.FileTime), DataFrame]

  private def mtime(path: String): java.nio.file.attribute.FileTime =
    try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path))
    catch { // non-local or vanished path: a constant key (plain read below throws the real error)
      case _: Throwable => java.nio.file.attribute.FileTime.fromMillis(0L)
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    synchronized {
      val p = s"$dir/$name.parquet"
      loadCache.getOrElseUpdate((spark, p, mtime(p)), spark.read.parquet(p))
    }

  /** Typed loader dispatch: the single place that knows which tables
    * need a normalizing loader (events' ns-timestamp today; any future
    * one slots in here). Views and generic table access should use THIS,
    * not the raw `apply`, so the SQL and DataFrame surfaces can't
    * silently diverge.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => events(spark, dir)
    case other    => apply(spark, dir, other)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts has shipped as parquet timestamp[ns] (read as long nanos
    * via spark.sql.legacy.parquet.nanosAsLong) and as timestamp[us]
    * (read as TIMESTAMP_NTZ since the files carry no UTC flag), depending
    * on the generator era. Normalize BOTH to a session-zone (UTC)
    * microsecond TimestampType so every downstream query sees one schema
    * — the same value DuckDB produces reading the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => requireUtc(s); raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other — unknown fixture era; extend Tables.events/eventsRange together")
    }
  }

  /** The NTZ→TimestampType cast is session-timezone dependent: it is only
    * value-preserving because GraftSession pins the session zone to UTC.
    * Fail loudly on a mis-configured session instead of silently shifting
    * every event timestamp.
    */
  private def requireUtc(s: SparkSession): Unit = {
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC",
      s"events NTZ normalization requires spark.sql.session.timeZone=UTC (GraftSession sets it); found '$tz'")
  }

  /** Sargable time-range scan of events: a filter written against the
    * NORMALIZED view wraps `ts` in arithmetic/cast, so it can never reach
    * the parquet scan — at 100 TB that's the difference between reading a
    * day and reading the lake. This loader pushes the range predicate in
    * the file's native representation (int64 nanos for the ns era —
    * floor(ns/1000) >= fromUs iff ns >= fromUs*1000 — or an NTZ literal
    * for the µs era), THEN normalizes, so row groups outside the window
    * never leave disk. PlanSpec pins the predicate in PushedFilters.
    */
  def eventsRange(s: SparkSession, d: String, fromUs: Long, untilUs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.filter(col("ts") >= fromUs * 1000L && col("ts") < untilUs * 1000L)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        requireUtc(s)
        def ntz(us: Long) = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        raw.filter(col("ts") >= lit(ntz(fromUs)) && col("ts") < lit(ntz(untilUs)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw.filter(col("ts") >= timestamp_micros(lit(fromUs)) && col("ts") < timestamp_micros(lit(untilUs)))
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other — unknown fixture era; extend Tables.events/eventsRange together")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
