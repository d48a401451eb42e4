package graft.cnpj

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** End-to-end ingestion driver (SURVEY §3.1): the Spark-native equivalent
  * of the reference's whole state machine.
  *
  *   listTables (S3) → scrape+parse listing (S1/S2) → manifest build
  *   (check_update ops) → per-table freshness gate (F1-F3) → per-file
  *   fetch tasks (M2) → CSV decode (S7/T2/T5) → partitioned lake write
  *   (K1/K2) → catalog sync (K5).
  *
  * Table-level Map (M1): tables are processed CONCURRENTLY on a bounded
  * pool (reference fans out all tables via the INLINE Map state,
  * `state_machine.asl:24-131`), with per-table failure isolation — one
  * table's error is recorded in its TableResult and never aborts the
  * others. Spark job scheduling is thread-safe, so each table's fetch/
  * decode/write jobs interleave on the cluster; the bound keeps the big
  * tables (empresas/estabelecimentos at ~50M rows) from being starved by
  * many tiny dimension tables, whose wall-clock is dominated by per-table
  * fixed cost (HTTP + tiny write + partition recovery) and who benefit
  * most from running in parallel.
  */
object IngestJob {

  case class TableResult(table: String, updated: Boolean, rows: Long, error: Option[String])

  /** Test hook: thread that processed each table in the last run. */
  private[cnpj] val processingThreads =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def run(
      spark: SparkSession,
      requestedTables: Seq[String],
      repositoryUrl: String,
      lakeRoot: String,
      stagingDir: String,
      bucketName: String = "local",
      db: String = "default",
      maxConcurrentTables: Int = 4): Seq[TableResult] = {

    val tablesInCatalog = CatalogOps.listTables(spark, db) // S3
    val html = Retry.withBackoff(attempts = 3, firstDelayMs = 1000) {
      ListingScraper.fetch(repositoryUrl) // S1, 15s timeout + F4 retry
    }
    runWithListing(spark, ListingScraper.parse(html), requestedTables,
      tablesInCatalog, repositoryUrl, lakeRoot, stagingDir, bucketName, db,
      maxConcurrentTables)
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
      db: String = "default",
      maxConcurrentTables: Int = 4): Seq[TableResult] = {

    require(maxConcurrentTables >= 1,
      s"maxConcurrentTables must be >= 1; got $maxConcurrentTables")
    val manifest = ManifestBuilder.build(spark, listing, requestedTables,
      tablesInCatalog, bucketName, repositoryUrl).collect().toSeq
    if (manifest.isEmpty) return Seq.empty

    processingThreads.clear()
    val pool = Executors.newFixedThreadPool(math.min(maxConcurrentTables, manifest.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // one Future per table; results keep manifest order regardless of
      // completion order, and every exception is captured per-table
      val futures = manifest.map(tm => Future(processTable(spark, tm, lakeRoot, stagingDir, db)))
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }

  /** One table end-to-end: gate → fetch → decode → write → catalog.
    * Never throws — failures come back as TableResult.error (M1).
    */
  private def processTable(
      spark: SparkSession,
      tm: TableManifest,
      lakeRoot: String,
      stagingDir: String,
      db: String): TableResult = {
    import spark.implicits._
    processingThreads.put(tm.name, Thread.currentThread().getName)
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
