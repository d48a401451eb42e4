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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
  /** events.ts is parquet timestamp[ns]; Spark reads it as long nanos
    * (spark.sql.legacy.parquet.nanosAsLong). Normalize to a microsecond
    * timestamp — the same truncation DuckDB applies when reading ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Sargable time-range scan of events: the normalized view above wraps
    * `ts` in arithmetic, so a filter on it can never reach the parquet
    * scan — at 100 TB that's the difference between reading a day and
    * reading the lake. This loader pushes the range as an exact int64
    * NANOSECOND predicate on the raw column (floor(ns/1000) >= fromUs
    * iff ns >= fromUs*1000, and < untilUs iff ns < untilUs*1000, so the
    * µs-truncation semantics are preserved exactly), then normalizes.
    * PlanSpec pins the predicate in PushedFilters.
    */
  def eventsRange(s: SparkSession, d: String, fromUs: Long, untilUs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .filter(col("ts") >= fromUs * 1000L && col("ts") < untilUs * 1000L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
