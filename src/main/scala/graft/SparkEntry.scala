package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible query. Column names are aliased identically on both
  * sides; every query orders its result deterministically.
  */
object SparkEntry {

  /** All registered queries, from the per-area registries. */
  def allQueries: Seq[Q] =
    Relational.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimQueries.queries ++ TypedQueries.queries ++ CurationQueries.queries ++
      CnpjLakeQueries.queries ++ AnalyticsQueries.queries ++
      BehaviorQueries.queries ++ ExportQueries.queries ++
      PipelineQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full star join: one fact shuffle, every dimension broadcast.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_star_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
