package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-string entry point: the same engine surface through `spark.sql`.
  *
  * Registers the testdata tables as temp views so any ANSI SQL the
  * DataFrame queries express can run verbatim — the "Athena side" of the
  * reference's split, served by the same session (one more reason no
  * external warehouse is needed).
  */
object SqlSurface {

  // last dir registered per session: view registration re-loads all ten
  // tables (footer + listing each — ~0.5-1.5 s, measured as the whole
  // "build" cost of every verbatim-SQL row), and temp views are
  // session-global state keyed by NAME — so registration only needs to
  // re-run when the dir it would serve actually changes (the bench's
  // warmup→timed dir switch re-registers exactly once)
  private val registeredDir =
    scala.collection.mutable.Map.empty[SparkSession, String]

  def registerViews(spark: SparkSession, dir: String): Unit = synchronized {
    if (!registeredDir.get(spark).contains(dir)) {
      Tables.all.foreach { t =>
        // Tables.load is the typed-loader dispatch, so views carry the
        // same normalizations as the DataFrame surface (events.ts is
        // parquet ns read as long — Tables.events turns it into a real
        // microsecond timestamp; the raw reader would silently diverge).
        Tables.load(spark, dir, t).createOrReplaceTempView(t)
        ()
      }
      registeredDir(spark) = dir
    }
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
