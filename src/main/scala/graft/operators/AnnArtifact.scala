package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ANN index's ARTIFACT leg — persist and reload the IVF family's
  * index state ([[TextModelSeam]]'s model-artifact treatment at
  * DataFrame scale): a real deployment builds the index once and probes
  * it for months, across sessions and clusters; until now the
  * centroids, inverted lists, SQ8 codes, sign words, and PQ codebooks
  * lived only as session-memoized frames and died with the JVM.
  *
  * Layout under one directory (the [[ArtifactStore]] discipline):
  *
  *   MANIFEST.json    — format version, the driver-side index dims, the
  *                      persisted tables and their exact schemas. Written
  *                      LAST, so a manifest's existence certifies every
  *                      table landed (the Merge `_SUCCESS` discipline
  *                      lifted to the whole index).
  *   centroids.bin    — the IVF centroids: magic + CRC32 + (k, dim,
  *                      raw IEEE-754 long bits) — integer-exact doubles,
  *                      byte-identical re-saves.
  *   pq_codebooks.bin — the PQ sub-codebooks, same framing (optional).
  *   assigned/        — parquet: the inverted lists (vec_id, uv, cluster).
  *   q8/ sign/ pq/    — parquet: the SQ8 / sign / PQ-coded rungs
  *                      (whichever were built; all optional).
  *
  * Loading verifies EVERYTHING before returning a frame: manifest
  * version (a format-skew artifact fails by NAME, never by silently
  * misread bytes), blob magic + CRC (a flipped centroid byte must not
  * become a quietly wrong router), per-table `_SUCCESS` presence and
  * exact schema equality (a column renamed or retyped between versions
  * fails at load, not as a null-joined empty probe — the
  * requireAnchorState lesson). Loud-at-load over quiet-at-query,
  * everywhere.
  *
  * The loaded index is plan-equivalent to the built one: IvfArtifactSpec
  * pins loaded == built top-k BIT-FOR-BIT on all four serving rungs
  * (raw / SQ8 / sign / IVF-PQ) and that [[IvfSearch.appendAssigned]]
  * composes with a loaded index exactly as with a built one — the
  * build-once / append-forever deployment.
  */
object AnnArtifact {

  /** Artifact format version — bumped on ANY layout/semantic change so
    * a stale reader or writer fails by name.
    */
  val FormatVersion = 1

  private val CentroidMagic = 0x4741_4E43 // "GANC"
  private val PqMagic = 0x4741_4E50       // "GANP"

  /** Everything [[load]] returns: the driver-side indexes plus the
    * persisted rungs that were present (lazily-read parquet frames —
    * loading ships no data).
    */
  final case class Loaded(ivf: IvfSearch.IvfIndex,
                          assigned: DataFrame,
                          quantized: Option[DataFrame],
                          signed: Option[DataFrame],
                          pq: Option[PqSearch.PqIndex],
                          pqEncoded: Option[DataFrame])

  private def doublesToBytes(header: Seq[Int], flat: Array[Double]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    header.foreach(d.writeInt)
    // raw IEEE-754 bits: integer-exact round trip, byte-identical saves
    flat.foreach(x => d.writeLong(java.lang.Double.doubleToRawLongBits(x)))
    d.flush()
    bos.toByteArray
  }

  // ---- save -----------------------------------------------------------

  /** Persist an index directory. `assigned` is the mandatory rung (the
    * inverted lists every serving path routes through); the SQ8 / sign /
    * PQ rungs persist when given. The manifest lands LAST.
    */
  def save(spark: SparkSession, dir: String,
           ivf: IvfSearch.IvfIndex,
           assigned: DataFrame,
           quantized: Option[DataFrame] = None,
           signed: Option[DataFrame] = None,
           pq: Option[PqSearch.PqIndex] = None,
           pqEncoded: Option[DataFrame] = None): Unit = {
    require(pqEncoded.isEmpty || pq.nonEmpty,
      "pqEncoded rows are meaningless without their codebooks — pass pq too")
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    val k = ivf.centroids.length
    require(k > 0, "cannot persist an index with zero centroids")
    val dim = ivf.centroids.head.length
    require(ivf.centroids.forall(_.length == dim),
      "ragged centroids — the index is corrupt before saving")
    ArtifactStore.writeBlob(root.resolve("centroids.bin"), CentroidMagic,
      doublesToBytes(Seq(k, dim), ivf.centroids.flatten))
    pq.foreach { p =>
      ArtifactStore.writeBlob(root.resolve("pq_codebooks.bin"), PqMagic,
        doublesToBytes(Seq(p.m, p.ks, p.dsub, p.dim), p.codebooks.flatten.flatten))
    }
    val tables = Seq("assigned" -> Some(assigned), "q8" -> quantized,
      "sign" -> signed, "pq" -> pqEncoded)
      .collect { case (name, Some(df)) => name -> df }
    ArtifactStore.commit(dir, "graft-ann", FormatVersion, tables) { node =>
      node.put("k", k)
      node.put("dim", dim)
      node.put("pq", pq.nonEmpty)
    }
  }

  // ---- load -----------------------------------------------------------

  /** Load an index directory, verifying version, blob integrity, table
    * commit markers, and exact schemas before returning anything. The
    * parquet frames are lazy reads — loading is metadata-only.
    */
  def load(spark: SparkSession, dir: String): Loaded = {
    val root = java.nio.file.Paths.get(dir)
    val m = ArtifactStore.manifest(dir, "graft-ann", FormatVersion, "ANN index")
    // centroids
    val cb = ArtifactStore.readBlob(root.resolve("centroids.bin"),
      CentroidMagic, "centroid")
    val cin = new java.io.DataInputStream(new java.io.ByteArrayInputStream(cb))
    val k = cin.readInt(); val dim = cin.readInt()
    require(k == m.path("k").asInt() && dim == m.path("dim").asInt(),
      s"$dir: centroid blob dims ($k x $dim) disagree with the manifest " +
        s"(${m.path("k").asInt()} x ${m.path("dim").asInt()})")
    require(cb.length == 8 + 8L * k * dim,
      s"$dir: centroid payload holds ${(cb.length - 8) / 8} doubles, expected ${k * dim}")
    val centroids = Array.fill(k)(Array.fill(dim)(
      java.lang.Double.longBitsToDouble(cin.readLong())))
    val ivf = IvfSearch.IvfIndex(centroids)
    // PQ codebooks (optional by manifest)
    val pq = if (!m.path("pq").asBoolean(false)) None else {
      val pb = ArtifactStore.readBlob(root.resolve("pq_codebooks.bin"),
        PqMagic, "PQ codebook")
      val pin = new java.io.DataInputStream(new java.io.ByteArrayInputStream(pb))
      val pm = pin.readInt(); val ks = pin.readInt()
      val dsub = pin.readInt(); val pdim = pin.readInt()
      require(pm > 0 && ks > 0 && dsub > 0 && pm * dsub == pdim,
        s"$dir: inconsistent PQ dims m=$pm ks=$ks dsub=$dsub dim=$pdim")
      require(pb.length == 16 + 8L * pm * ks * dsub,
        s"$dir: PQ payload holds ${(pb.length - 16) / 8} doubles, expected ${pm * ks * dsub}")
      val books = Array.fill(pm)(Array.fill(ks)(Array.fill(dsub)(
        java.lang.Double.longBitsToDouble(pin.readLong()))))
      Some(PqSearch.PqIndex(books, pdim))
    }
    val assigned = ArtifactStore.table(spark, dir, m, "assigned").getOrElse(
      throw new IllegalArgumentException(
        s"$dir: manifest lists no 'assigned' table — the mandatory rung is missing"))
    Loaded(ivf, assigned,
      ArtifactStore.table(spark, dir, m, "q8"),
      ArtifactStore.table(spark, dir, m, "sign"),
      pq,
      ArtifactStore.table(spark, dir, m, "pq"))
  }
}
