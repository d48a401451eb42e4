package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs through DuckDB on the same
  * parquet tables.
  *
  * Determinism contract (both sides):
  *   - every result ends in an explicit ORDER BY over a unique key set;
  *   - floating-point aggregates go through exact decimal arithmetic and are
  *     cast to double only at the end, so Spark and DuckDB produce
  *     bit-identical values regardless of summation order;
  *   - column names are aliased identically in the Spark plan and the SQL.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  /** Exact, order-independent sum of a double column: route through decimal.
    * Both Spark and DuckDB sum decimals exactly, so the final double cast is
    * bit-identical across engines. `scale` must cover the column's precision.
    */
  val DEC = "decimal(28,6)"
}
