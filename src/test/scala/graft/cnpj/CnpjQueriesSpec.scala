package graft.cnpj

import java.io.{File, FileOutputStream}
import java.nio.charset.Charset
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The analytics surface over an ingested CNPJ lake: the reference's
  * README motivating queries (delegated there to Athena), answered by
  * this engine over its own lake.
  */
class CnpjQueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  val work: File = Files.createTempDirectory("cnpj_q_spec").toFile
  val repoDir = new File(work, "repo"); repoDir.mkdirs()
  val lakeRoot = new File(work, "lake").getAbsolutePath
  val staging = new File(work, "staging").getAbsolutePath

  def writeZip(name: String, csv: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(new File(repoDir, name)))
    zos.putNextEntry(new ZipEntry(name.stripSuffix(".zip") + ".CSV"))
    zos.write(csv.getBytes(Charset.forName("ISO-8859-1")))
    zos.closeEntry()
    zos.close()
  }

  // 30-column estabelecimentos row with only the fields under test filled
  def estabRow(raiz: Long, muni: Long, dtAbrt: Long): String =
    Seq(raiz, "1", "11", "1", "FANT", "2", "20230101", "0", "", "105",
      dtAbrt.toString, "47113", "", "RUA", "DAS FLORES", "100", "", "CENTRO",
      "01000000", "SP", muni.toString, "11", "99999999", "", "", "", "", "a@b.c", "", "")
      .mkString(";")

  writeZip("Municipios.zip", "100;CAMPINAS\n200;SANTOS\n")
  writeZip("Naturezas.zip", "2062;Sociedade Limitada\n2011;Empresa Publica\n")
  writeZip("Empresas7.zip",
    "111;ALFA LTDA;2062;49;1000,00;1;\n" +
      "222;BETA SA;2062;49;2000,50;3;SP\n" +
      "333;GAMA EP;2011;49;500,00;1;\n")
  writeZip("Estabelecimentos9.zip",
    Seq(estabRow(111, 100, 20200101), estabRow(111, 100, 20210101),
      estabRow(222, 100, 20220101), estabRow(333, 200, 20230101)).mkString("\n") + "\n")

  val html: String = Seq("Municipios.zip", "Naturezas.zip", "Empresas7.zip", "Estabelecimentos9.zip")
    .map(n => s"""<tr><td><img src="/icons/compressed.gif" alt=""></td>""" +
      s"""<td><a href="$n">$n</a></td><td align="right">2023-06-01 08:00</td></tr>""")
    .mkString("<table>", "", "</table>")

  test("ingest the 4-table lake, then answer the README's analytics over it") {
    import spark.implicits._
    val res = IngestJob.runWithListing(spark, ListingScraper.parse(html),
      Seq("municipios", "naturezas", "empresas", "estabelecimentos"),
      tablesInCatalog = Set(), repoDir.toURI.toString, lakeRoot, staging, "bkt", db = "cnpj_q")
    assert(res.forall(_.error.isEmpty), res.mkString("; "))

    val perMuni = CnpjQueries.establishmentsPerMunicipality(spark, db = "cnpj_q")
      .as[(String, Long)].collect().toSeq
    assert(perMuni == Seq(("CAMPINAS", 3L), ("SANTOS", 1L)))

    val byNature = CnpjQueries.companiesByLegalNature(spark, db = "cnpj_q")
      .select($"desc", $"n_companies", $"total_capital")
      .as[(String, Long, Double)].collect().toSeq
    assert(byNature == Seq(("Sociedade Limitada", 2L, 3000.50), ("Empresa Publica", 1L, 500.00)))
  }

  test("ref_date predicates prune partitions down to the matching snapshot files") {
    import spark.implicits._
    // second snapshot partition written directly (newer ref_date)
    val extra = Seq((900L, "NOVA CIDADE")).toDF("codigo", "desc")
    Ingest.writeSnapshot(extra, lakeRoot, "municipios", 20230701)
    CatalogOps.ensureTable(spark, "municipios", lakeRoot, db = "cnpj_q")
    assert(CatalogOps.listPartitions(spark, "municipios", db = "cnpj_q").sorted ==
      Seq("20230601", "20230701"))

    val pruned = spark.table("cnpj_q.municipios").where($"ref_date" === "20230601")
    // partition pruning: only the matching snapshot's files are read
    assert(pruned.inputFiles.nonEmpty)
    assert(pruned.inputFiles.forall(_.contains("ref_date=20230601")), pruned.inputFiles.mkString(","))
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
  }

  test("date views expose typed DATE columns over yyyymmdd ints") {
    import spark.implicits._
    CnpjQueries.registerDateViews(spark, db = "cnpj_q")
    val d = spark.table("estabelecimentos_v")
      .where($"cnpj_raiz" === 333L)
      .select($"dt_abrt_date").as[java.sql.Date].head()
    assert(d == java.sql.Date.valueOf("2023-01-01"))
  }
}
