package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite
import graft.cnpj.{CatalogOps, CatalogStats}
import graft.queries.CnpjLakeQueries

/** Catalog statistics (reference crawler parameters, check_update.py:134-139):
  * the PLANNING effect (stats-informed broadcast without AQE) and the
  * metadata surface (sizeKey/recordCount/averageRecordSize, column stats).
  */
class CatalogStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  lazy val root: String = CnpjLakeQueries.ensureLake(spark)

  // per-test databases: the broadcast pin needs a PRISTINE (never-analyzed)
  // table for its "before" half, so it must not share tables with the
  // metadata tests (suites share one JVM/session)
  private def register(db: String, tables: String*): Unit =
    tables.foreach(t => CatalogOps.ensureTable(spark, t, root, db))

  test("planning-time broadcast: impossible before ANALYZE, fires after — no AQE involved") {
    val db = "cnpj_stats_bc"
    register(db, "municipios", "estabelecimentos")
    def joinPlan(): SparkPlan = {
      val m = spark.table(s"`$db`.`municipios`")
      val e = spark.table(s"`$db`.`estabelecimentos`")
      // no ref_date filter: sizing must come from CATALOG stats, not from
      // a partition-pruned file listing
      e.join(m, e("end_cod_muni") === m("codigo"))
        .groupBy(m("desc")).count()
        .queryExecution.sparkPlan // the pre-AQE physical plan
    }
    // without stats, a catalog-partitioned parquet table is sized
    // spark.sql.defaultSizeInBytes (Long.Max): broadcast cannot fire
    val before = joinPlan().toString
    assert(!before.contains("BroadcastHashJoin"),
      s"un-analyzed catalog tables must not broadcast at planning time:\n${before.take(800)}")
    CatalogStats.analyzeTable(spark, db, "municipios")
    val after = joinPlan().toString
    assert(after.contains("BroadcastHashJoin"),
      s"analyzed dimension (a few KB) must broadcast at planning time:\n${after.take(800)}")
  }

  test("tableStats exposes the crawler parameters: sizeKey, recordCount, averageRecordSize") {
    val db = "cnpj_stats_meta"
    register(db, "municipios")
    assert(CatalogStats.tableStats(spark, db, "municipios").forall(_.rowCount.isEmpty),
      "no rowCount should be published before ANALYZE")
    CatalogStats.analyzeTable(spark, db, "municipios")
    val st = CatalogStats.tableStats(spark, db, "municipios")
      .getOrElse(fail("no stats after ANALYZE"))
    assert(st.rowCount.contains(110L)) // 50 (old snap) + 60 (new snap)
    assert(st.sizeInBytes > 0)
    assert(st.averageRecordSize.contains(st.sizeInBytes / 110))
  }

  test("partitionStats carries per-partition recordCount independently") {
    val db = "cnpj_stats_meta"
    register(db, "municipios")
    CatalogStats.analyzePartition(spark, db, "municipios", CnpjLakeQueries.Lake.OldSnap.toString)
    CatalogStats.analyzePartition(spark, db, "municipios", CnpjLakeQueries.Lake.NewSnap.toString)
    val o = CatalogStats.partitionStats(spark, db, "municipios", CnpjLakeQueries.Lake.OldSnap.toString)
    val n = CatalogStats.partitionStats(spark, db, "municipios", CnpjLakeQueries.Lake.NewSnap.toString)
    assert(o.flatMap(_.rowCount).contains(50L), s"old snapshot: $o")
    assert(n.flatMap(_.rowCount).contains(60L), s"new snapshot: $n")
  }

  test("column stats publish min/max/ndv/null-count for CBO and metadata readers") {
    val db = "cnpj_stats_meta"
    register(db, "municipios")
    CatalogStats.analyzeTable(spark, db, "municipios", columns = Seq("codigo"))
    val cs = CatalogStats.columnStats(spark, db, "municipios", "codigo")
    // codigo spans 1000..1059 over the two snapshots (60 distinct, no
    // nulls); min/max/nulls are exact, ndv is HLL++ (default 5% rsd — it
    // reports 59 here), so pin it inside the sketch's error envelope
    assert(cs.get("min").contains("1000"), cs.toString)
    assert(cs.get("max").contains("1059"), cs.toString)
    assert(cs.get("num_nulls").contains("0"), cs.toString)
    val ndv = cs.get("distinct_count").map(_.toLong)
      .getOrElse(fail(s"no distinct_count: $cs"))
    assert(ndv >= 57 && ndv <= 63, s"ndv $ndv outside 5% envelope of 60")
  }
}
