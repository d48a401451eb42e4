package graft.cnpj

import org.apache.spark.sql.SparkSession

/** Catalog statistics surface (the reference crawler's published table
  * parameters — `check_update.py:134-139`: `sizeKey`, `recordCount`,
  * `averageRecordSize`, `objectCount` — produced there by the Glue
  * crawler, here by `ANALYZE TABLE`).
  *
  * Two consumers at scale:
  *   - the PLANNER: persisted `sizeInBytes` lets a stats-informed
  *     broadcast fire at PLANNING time (CatalogFileIndex seeds relation
  *     size from catalog stats; without them a partitioned catalog table
  *     is sized `spark.sql.defaultSizeInBytes` = Long.Max and can never
  *     broadcast until AQE observes runtime sizes) — pinned in
  *     CatalogStatsSpec;
  *   - DOWNSTREAM metadata readers (the reference's check_update lambda
  *     reads `recordCount` off the catalog to decide work): `tableStats`
  *     / `partitionStats` re-expose the crawler fields, and q94 gates
  *     per-partition `recordCount` against DuckDB's independent count.
  *
  * Everything goes through public SQL (`ANALYZE TABLE`, `DESCRIBE
  * EXTENDED`) — no private catalog APIs. ANALYZE itself is a
  * metadata-plus-one-scan job: COMPUTE STATISTICS reads only file sizes
  * plus a count scan, and the column variant adds one pass of min/max/
  * ndv accumulators — both embarrassingly parallel.
  */
object CatalogStats {

  /** The crawler-parameter analog. `averageRecordSize` derives like the
    * reference's (bytes/record, floor; None until both parts exist).
    */
  final case class TableStats(sizeInBytes: Long, rowCount: Option[Long]) {
    def averageRecordSize: Option[Long] =
      rowCount.filter(_ > 0).map(sizeInBytes / _)
  }

  /** Table-level ANALYZE; with `columns`, also min/max/ndv/null-count per
    * column (feeds CBO join ordering and the DESCRIBE surface below).
    */
  def analyzeTable(spark: SparkSession, db: String, table: String,
                   columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE `$db`.`$table` COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE `$db`.`$table` COMPUTE STATISTICS FOR COLUMNS " +
        columns.map(c => s"`$c`").mkString(", "))
    ()
  }

  /** Partition-level ANALYZE — the crawler's per-partition recordCount. */
  def analyzePartition(spark: SparkSession, db: String, table: String,
                       refDate: String): Unit = {
    spark.sql(s"ANALYZE TABLE `$db`.`$table` PARTITION (ref_date='$refDate') " +
      "COMPUTE STATISTICS")
    ()
  }

  /** "<n> bytes, <m> rows" (rows optional) — the DESCRIBE stats format. */
  private def parseStats(s: String): Option[TableStats] = {
    val bytes = "(\\d+)\\s+bytes".r.findFirstMatchIn(s).map(_.group(1).toLong)
    val rows = "(\\d+)\\s+rows".r.findFirstMatchIn(s).map(_.group(1).toLong)
    bytes.map(TableStats(_, rows))
  }

  private def statRow(rows: Array[(String, String)], key: String): Option[TableStats] =
    rows.collectFirst { case (k, v) if k.trim == key => v }.flatMap(parseStats)

  private def describe(spark: SparkSession, sql: String): Array[(String, String)] =
    spark.sql(sql).collect().map(r => (r.getString(0), r.getString(1)))

  /** Persisted table-level stats, None before any ANALYZE. */
  def tableStats(spark: SparkSession, db: String, table: String): Option[TableStats] =
    statRow(describe(spark, s"DESCRIBE TABLE EXTENDED `$db`.`$table`"), "Statistics")

  /** Persisted per-partition stats, None before the partition's ANALYZE. */
  def partitionStats(spark: SparkSession, db: String, table: String,
                     refDate: String): Option[TableStats] =
    statRow(
      describe(spark,
        s"DESCRIBE TABLE EXTENDED `$db`.`$table` PARTITION (ref_date='$refDate')"),
      "Partition Statistics")

  /** Column-level stats (min/max/num_nulls/distinct_count/…) as the
    * DESCRIBE info map; empty before `analyzeTable(..., columns)`.
    */
  def columnStats(spark: SparkSession, db: String, table: String,
                  column: String): Map[String, String] =
    describe(spark, s"DESCRIBE TABLE EXTENDED `$db`.`$table` `$column`")
      .toMap.filter { case (_, v) => v != null && v.nonEmpty && v != "NULL" }
}
