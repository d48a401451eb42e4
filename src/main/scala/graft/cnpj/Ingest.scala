package graft.cnpj

import java.io.{File, FileOutputStream}
import java.net.URI
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Data-plane ingestion: fetch → unzip → decode CSV → partitioned lake
  * (SURVEY S5/S6/S7, T2/T5, K1-K4, M2, F4).
  *
  * The reference runs one 9 GB lambda per zip (`fetch_data.py:48-88`);
  * here each FileTask is one Spark task (`mapPartitions` over the
  * repartitioned task set — SURVEY M2), staging the extracted CSV to
  * `stagingDir` (shared storage on a real cluster), after which the CSV
  * reader splits large files across tasks and streams row groups out —
  * the reference's whole-table-in-RAM blowup (README.md:259-265) does
  * not exist here. Task retries come from Spark (F4 analog); driver-side
  * HTTP goes through Retry.withBackoff.
  */
object Ingest {

  /** S5+S6: download each task's zip and extract the FIRST member only
    * (reference quirk #1, `fetch_data.py:65`: `namelist()[0]`). Returns
    * (task, stagedCsvPath). Runs as Spark tasks — N files = N tasks.
    */
  def fetchAndStage(tasks: Dataset[FileTask], stagingDir: String): Dataset[(FileTask, String)] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    val n = tasks.count().toInt.max(1)
    tasks.repartition(n).mapPartitions { it =>
      it.map { task =>
        val zipName = task.url.substring(task.url.lastIndexOf('/') + 1)
        val stem = zipName.split("\\.")(0)
        val local = new File(stagingDir, zipName)
        local.getParentFile.mkdirs()
        Retry.withBackoff(attempts = 3, firstDelayMs = 100) {
          val in = new URI(task.url).toURL.openStream()
          try Files.copy(in, local.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
        val zf = new ZipFile(local)
        val csvPath = try {
          val first = zf.entries().nextElement() // first member ONLY
          val out = new File(stagingDir, s"$stem.csv")
          val os = new FileOutputStream(out)
          try zf.getInputStream(first).transferTo(os) finally os.close()
          out.getAbsolutePath
        } finally zf.close()
        local.delete() // K4 scratch cleanup
        (task, csvPath)
      }
    }
  }

  /** S7+T2+T5: headerless `;`-separated latin-1 CSV with the declared
    * schema. Double columns arrive with decimal COMMAS (reference
    * `fetch_data.py:73`): they are read as strings and converted, which
    * round-trips pyarrow's `decimal_point=','` exactly. FAILFAST so
    * upstream schema drift fails loudly instead of silently misaligning
    * (SURVEY §7.4).
    */
  def readCsv(spark: SparkSession, table: String, paths: Seq[String]): DataFrame = {
    val target = Schemas(table)
    val readSchema = StructType(target.map {
      case f if f.dataType == DoubleType => f.copy(dataType = org.apache.spark.sql.types.StringType)
      case f => f
    })
    val raw = spark.read
      .schema(readSchema)
      .option("sep", ";")
      .option("encoding", "ISO-8859-1")
      .option("header", "false")
      .option("mode", "FAILFAST")
      .csv(paths: _*)
    target.filter(_.dataType == DoubleType).foldLeft(raw) { (df, f) =>
      df.withColumn(f.name, decimalComma(col(f.name)))
    }
  }

  /** T2: decimal-comma string → double ("1234,56" → 1234.56). */
  def decimalComma(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, ",", "\\.").cast("double")

  /** K1/K2: write one table snapshot into the partitioned lake:
    * `<lakeRoot>/cnpj_db/<table>/ref_date=<yyyymmdd>/`. Dynamic partition
    * overwrite (GraftSession default) makes re-runs idempotent — the
    * reference gets the same by overwriting fixed S3 keys
    * (`fetch_data.py:82-83`).
    */
  def writeSnapshot(df: DataFrame, lakeRoot: String, table: String, refDate: Int): Unit =
    df.withColumn("ref_date", lit(refDate.toString)) // string partition, quirk #4
      .write
      .partitionBy("ref_date")
      .mode("overwrite")
      .parquet(s"$lakeRoot/cnpj_db/$table")
}

/** F4: bounded retry with exponential backoff (reference: 2 retries,
  * 60 s interval, ×2 backoff — `state_machine.asl:68-77,109-118`).
  */
object Retry {
  def withBackoff[A](attempts: Int, firstDelayMs: Long)(body: => A): A = {
    var remaining = attempts
    var delay = firstDelayMs
    while (true) {
      try return body
      catch {
        case e: Throwable =>
          remaining -= 1
          if (remaining <= 0) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
