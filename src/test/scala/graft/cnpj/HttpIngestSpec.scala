package graft.cnpj

import java.io.{File, FileOutputStream}
import java.net.InetSocketAddress
import java.nio.charset.Charset
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Full-path ingest over a real HTTP server: IngestJob.run does the S1
  * listing fetch with HttpClient (retry-wrapped), then the per-task S5
  * downloads hit the same server from Spark executor threads.
  */
class HttpIngestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  val work: File = Files.createTempDirectory("cnpj_http").toFile
  val lakeRoot = new File(work, "lake").getAbsolutePath
  val staging = new File(work, "staging").getAbsolutePath

  def zipBytes(member: String, content: String): Array[Byte] = {
    val f = File.createTempFile("zip", ".zip", work)
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry(member))
    zos.write(content.getBytes(Charset.forName("ISO-8859-1")))
    zos.closeEntry(); zos.close()
    Files.readAllBytes(f.toPath)
  }

  test("IngestJob.run over HTTP: listing fetch, per-task downloads, lake write") {
    val motivos = zipBytes("MOTICSV", "0;SEM MOTIVO\n1;EXTINÇÃO\n")
    val listing =
      """<table><tr><td><img src="/icons/compressed.gif"></td>""" +
        """<td><a href="Motivos.zip">Motivos.zip</a></td>""" +
        """<td>2023-07-01 10:00</td></tr></table>"""

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/CNPJ/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        hits.add(path)
        val body: Array[Byte] =
          if (path.endsWith("Motivos.zip")) motivos else listing.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/CNPJ/"
      val res = IngestJob.run(spark, Seq("motivos"), url, lakeRoot, staging,
        bucketName = "bkt", db = "cnpj_http")
      assert(res == Seq(IngestJob.TableResult("motivos", updated = true, 2L, None)))
      import scala.jdk.CollectionConverters._
      val paths = hits.asScala.toList
      assert(paths.exists(_.endsWith("/CNPJ/")), "listing must be fetched over HTTP")
      assert(paths.exists(_.endsWith("Motivos.zip")), "zip must be downloaded over HTTP")
      import spark.implicits._
      assert(spark.table("cnpj_http.motivos").where($"codigo" === 1)
        .select($"desc").as[String].head() == "EXTINÇÃO")
    } finally server.stop(0)
  }
}
