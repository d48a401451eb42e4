package graft.cnpj

import org.apache.spark.sql.SparkSession

/** End-to-end ingestion driver (SURVEY §3.1): the Spark-native equivalent
  * of the reference's whole state machine.
  *
  *   listTables (S3) → scrape+parse listing (S1/S2) → manifest build
  *   (check_update ops) → per-table freshness gate (F1-F3) → per-file
  *   fetch tasks (M2) → CSV decode (S7/T2/T5) → partitioned lake write
  *   (K1/K2) → catalog sync (K5).
  *
  * Per-table isolation (M1): tables are processed independently; one
  * table's failure doesn't abort the others (reference TableLoop
  * branches, `state_machine.asl:24-131`). Tables run sequentially on the
  * driver — Spark's task-level parallelism inside each table dominates,
  * and sequential table loops keep cluster resources for the big tables
  * (empresas/estabelecimentos at ~50M rows each).
  */
object IngestJob {

  case class TableResult(table: String, updated: Boolean, rows: Long, error: Option[String])

  def run(
      spark: SparkSession,
      requestedTables: Seq[String],
      repositoryUrl: String,
      lakeRoot: String,
      stagingDir: String,
      bucketName: String = "local",
      db: String = "default"): Seq[TableResult] = {

    val tablesInCatalog = CatalogOps.listTables(spark, db) // S3
    val html = Retry.withBackoff(attempts = 3, firstDelayMs = 1000) {
      ListingScraper.fetch(repositoryUrl) // S1, 15s timeout + F4 retry
    }
    runWithListing(spark, ListingScraper.parse(html), requestedTables,
      tablesInCatalog, repositoryUrl, lakeRoot, stagingDir, bucketName, db)
  }

  /** Entry point with a pre-fetched listing (testable without network). */
  def runWithListing(
      spark: SparkSession,
      listing: Seq[ListingEntry],
      requestedTables: Seq[String],
      tablesInCatalog: Set[String],
      repositoryUrl: String,
      lakeRoot: String,
      stagingDir: String,
      bucketName: String,
      db: String = "default"): Seq[TableResult] = {
    import spark.implicits._

    val manifest = ManifestBuilder.build(spark, listing, requestedTables,
      tablesInCatalog, bucketName, repositoryUrl).collect().toSeq

    manifest.map { tm =>
      try {
        // F1/F2/F3: skip fresh tables (no-op branch, reference asl:90-92)
        val stale = !tm.exists ||
          FreshnessGate.shouldUpdate(tm, CatalogOps.listPartitions(spark, tm.name, db))
        if (!stale) TableResult(tm.name, updated = false, 0L, None)
        else {
          val staged = Ingest.fetchAndStage(
            spark.createDataset(tm.files), s"$stagingDir/${tm.name}").collect() // M2
          try {
            val df = Ingest.readCsv(spark, tm.name, staged.map(_._2).toSeq)
            Ingest.writeSnapshot(df, lakeRoot, tm.name, tm.ref_date)
            CatalogOps.ensureTable(spark, tm.name, lakeRoot, db) // K5
            val rows = spark.table(s"`$db`.`${tm.name}`")
              .where($"ref_date" === tm.ref_date.toString).count()
            TableResult(tm.name, updated = true, rows, None)
          } finally {
            // K4: scratch cleanup must also run on failed decodes, or
            // multi-GB extracted CSVs pile up across retried runs
            staged.foreach(s => new java.io.File(s._2).delete())
          }
        }
      } catch {
        // M1: per-table failure isolation
        case e: Throwable => TableResult(tm.name, updated = false, 0L, Some(e.getMessage))
      }
    }
  }
}
