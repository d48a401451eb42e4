package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnArtifact, IvfPq, IvfSearch, PqSearch, SimSearch}

/** Pins the ANN index artifact leg (AnnArtifact):
  *   - loaded index == built index BIT-FOR-BIT on all four serving
  *     rungs (raw lists / SQ8 / sign / IVF-PQ) over cold queries;
  *   - centroids and PQ codebooks round-trip integer-exact and re-save
  *     byte-identically;
  *   - incremental append composes with a LOADED index exactly as with
  *     the built one (the build-once / append-forever deployment);
  *   - corrupted, truncated, foreign, version-skewed, uncommitted, and
  *     schema-skewed artifacts all fail LOUDLY at load, by name.
  */
class IvfArtifactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, sf)

  /** Cold queries: perturbed copies of corpus vectors, disjoint ids. */
  private def coldQueries = corpus.filter(col("vec_id") < 8).select(
    (col("vec_id") + 1000000L).as("vec_id"),
    transform(col("embedding"), x => x * lit(1.3) + lit(0.017)).as("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("round trip: loaded == built bit-for-bit on all four serving rungs; blobs re-save byte-identically") {
    val ivf = IvfSearch.build(corpus, k = 8, iters = 2)
    val assigned = IvfSearch.assign(corpus, ivf)
    val quantized = IvfSearch.quantizeAssigned(assigned)
    val signed = IvfSearch.signAssigned(corpus, ivf)
    val pq = PqSearch.train(corpus, m = 8, ks = 16, iters = 2)
    val pqEnc = IvfPq.encodeAssigned(corpus, ivf, pq)
    val dir = freshDir("ann_art")
    AnnArtifact.save(spark, dir, ivf, assigned, Some(quantized), Some(signed),
      Some(pq), Some(pqEnc))
    val loaded = AnnArtifact.load(spark, dir)
    // driver-side indexes integer-exact (raw IEEE-754 bits round trip)
    assert(loaded.ivf.centroids.map(_.toSeq).toSeq ==
      ivf.centroids.map(_.toSeq).toSeq)
    assert(loaded.pq.get.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.pq.get.dim == pq.dim)
    val q = coldQueries
    // rung 1: raw inverted lists
    assert(rows(IvfSearch.topKAssigned(loaded.assigned, q, loaded.ivf, 5, 4)) ==
      rows(IvfSearch.topKAssigned(assigned, q, ivf, 5, 4)))
    // rung 2: SQ8 (exact re-rank against the raw corpus table)
    assert(rows(IvfSearch.topKQuantized(loaded.quantized.get, corpus, q,
        loaded.ivf, 5, 4)) ==
      rows(IvfSearch.topKQuantized(quantized, corpus, q, ivf, 5, 4)))
    // rung 3: sign words
    assert(rows(IvfSearch.topKSigned(loaded.signed.get, corpus, q,
        loaded.ivf, 5, 4)) ==
      rows(IvfSearch.topKSigned(signed, corpus, q, ivf, 5, 4)))
    // rung 4: IVF-PQ (codebooks + codes both from the artifact)
    assert(rows(IvfPq.topK(loaded.pqEncoded.get, q, loaded.ivf,
        loaded.pq.get, 5, 4)) ==
      rows(IvfPq.topK(pqEnc, q, ivf, pq, 5, 4)))
    // and the answers are non-trivial
    assert(rows(IvfSearch.topKAssigned(loaded.assigned, q, loaded.ivf, 5, 4)).nonEmpty)
    // identical models re-save byte-identically (the TextModelSeam pin)
    val dir2 = freshDir("ann_art2")
    AnnArtifact.save(spark, dir2, ivf, assigned, pq = Some(pq),
      pqEncoded = Some(pqEnc))
    def bytes(d: String, f: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(d, f)).toSeq
    assert(bytes(dir, "centroids.bin") == bytes(dir2, "centroids.bin"))
    assert(bytes(dir, "pq_codebooks.bin") == bytes(dir2, "pq_codebooks.bin"))
  }

  test("optional rungs: an index saved with only the mandatory lists loads with the others absent") {
    val ivf = IvfSearch.build(corpus, k = 4, iters = 1)
    val dir = freshDir("ann_min")
    AnnArtifact.save(spark, dir, ivf, IvfSearch.assign(corpus, ivf))
    val loaded = AnnArtifact.load(spark, dir)
    assert(loaded.quantized.isEmpty && loaded.signed.isEmpty &&
      loaded.pq.isEmpty && loaded.pqEncoded.isEmpty)
    assert(loaded.assigned.count() == corpus.count())
  }

  test("incremental append composes with a LOADED index exactly as with the built one") {
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    val ivf = IvfSearch.build(base, k = 8, iters = 2)
    val assignedBase = IvfSearch.assign(base, ivf)
    val dir = freshDir("ann_app")
    AnnArtifact.save(spark, dir, ivf, assignedBase)
    val loaded = AnnArtifact.load(spark, dir)
    // the r9 appendAssigned path, driven from the ARTIFACT: batch routed
    // through loaded centroids, unioned with the persisted lists
    val viaLoaded = IvfSearch.appendAssigned(loaded.assigned, batch, loaded.ivf)
    val viaBuilt = IvfSearch.appendAssigned(assignedBase, batch, ivf)
    assert(viaLoaded.count() == corpus.count())
    val q = coldQueries
    assert(rows(IvfSearch.topKAssigned(viaLoaded, q, loaded.ivf, 5, 8)) ==
      rows(IvfSearch.topKAssigned(viaBuilt, q, ivf, 5, 8)))
    // appended mass is genuinely served
    assert(IvfSearch.topKAssigned(viaLoaded, q, loaded.ivf, 5, 8)
      .filter(col("neighbor_id") % 5 === 0).count() > 0)
  }

  test("corruption, skew, and uncommitted tables fail loudly at load, by name") {
    val ivf = IvfSearch.build(corpus, k = 4, iters = 1)
    val assigned = IvfSearch.assign(corpus, ivf)
    val quantized = IvfSearch.quantizeAssigned(assigned)
    def fresh(tag: String): String = {
      val d = freshDir(tag)
      AnnArtifact.save(spark, d, ivf, assigned, Some(quantized))
      d
    }
    import java.nio.file.{Files, Paths}
    // (a) flipped centroid byte -> CRC refuses
    val dA = fresh("ann_crc")
    val cPath = Paths.get(dA, "centroids.bin")
    val cb = Files.readAllBytes(cPath)
    cb(cb.length - 1) = (cb(cb.length - 1) ^ 0x20).toByte
    Files.write(cPath, cb)
    val crcEx = intercept[IllegalArgumentException] { AnnArtifact.load(spark, dA) }
    assert(crcEx.getMessage.contains("CRC"))
    // (b) truncated blob -> declared/present mismatch
    val dB = fresh("ann_trunc")
    val bPath = Paths.get(dB, "centroids.bin")
    Files.write(bPath, Files.readAllBytes(bPath).dropRight(7))
    assert(intercept[IllegalArgumentException] { AnnArtifact.load(spark, dB) }
      .getMessage.contains("truncated"))
    // (c) foreign bytes -> magic check names it
    val dC = fresh("ann_foreign")
    Files.write(Paths.get(dC, "centroids.bin"),
      "not an index at all".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { AnnArtifact.load(spark, dC) }
      .getMessage.contains("not a centroid blob"))
    // (d) version skew -> refused by NAME with both versions
    val dD = fresh("ann_ver")
    val mPath = Paths.get(dD, "MANIFEST.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val mj = om.readTree(Files.readAllBytes(mPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    mj.put("version", 99)
    Files.write(mPath, om.writeValueAsBytes(mj))
    val verEx = intercept[IllegalArgumentException] { AnnArtifact.load(spark, dD) }
    assert(verEx.getMessage.contains("version 99") &&
      verEx.getMessage.contains(s"version ${AnnArtifact.FormatVersion}"))
    // (e) a table whose write never committed -> _SUCCESS gate
    val dE = fresh("ann_commit")
    Files.delete(Paths.get(dE, "q8", "_SUCCESS"))
    assert(intercept[IllegalArgumentException] { AnnArtifact.load(spark, dE) }
      .getMessage.contains("_SUCCESS"))
    // (f) schema skew: a rung overwritten with different columns ->
    //     manifest schema equality names the table
    val dF = fresh("ann_schema")
    // overwrite from the in-memory lineage (reading dF/q8 while
    // overwriting it would fail at analysis, not exercise the guard)
    quantized.withColumnRenamed("scale", "scl")
      .write.mode("overwrite").parquet(s"$dF/q8")
    assert(intercept[IllegalArgumentException] { AnnArtifact.load(spark, dF) }
      .getMessage.contains("schema"))
    // (g) no manifest at all -> not an index (a killed save never
    //     presents as one: the manifest is written last)
    val dG = freshDir("ann_nomanifest")
    assert(intercept[IllegalArgumentException] { AnnArtifact.load(spark, dG) }
      .getMessage.contains("MANIFEST"))
  }
}
