package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Model-inference seam for per-document text scoring — the
  * [[graft.multimodal.VideoSeam]] discipline applied to the quality /
  * language-ID classifier slot every published curation pipeline has
  * (CCNet's KenLM, fastText LID, FineWeb's quality classifier). A real
  * deployment scores with a PRETRAINED model artifact loaded from disk;
  * that loading is codec-like — native/JNI contexts, model files,
  * arena allocations — and what the ENGINE owns is the seam it snaps
  * into:
  *
  *   - [[TextScorer]]: text in, scores out. Nothing Spark-specific
  *     leaks in, so an implementation is testable without a session.
  *   - per-PARTITION construction: implementations are handed to Spark
  *     as a `() => TextScorer` factory; a model file loads once per
  *     partition, never per row and never serialized from the driver.
  *   - per-ROW quarantine: at 100 TB some documents WILL break a
  *     tokenizer or overflow a model's assumptions; a bad row becomes
  *     an `ok = false` row carrying the scorer's message (the
  *     `decodeImageFeaturesSafe` contract), so one poison doc cannot
  *     kill a 1000-executor job.
  *
  * [[BigramLmScorer]] implements the interface with the q192 add-one
  * bigram LM — the existence proof that the seam is sufficient for a
  * real scoring model, pinned BIT-FOR-BIT against the join-based
  * [[NgramLm.score]] (TextModelSeamSpec). Scope contract: the seam is
  * for BOUNDED model artifacts (the CCNet shape — a pretrained model
  * that fits an executor, loaded per partition). The self-trained
  * corpus bigram table is NOT bounded at corpus scale; when the model
  * is corpus-sized, use the shuffle-join [[NgramLm.score]] twin — the
  * two produce identical scores, which is exactly what the spec pins.
  */
object TextModelSeam {

  /** Per-document scores in the q192 integer milli-bit scale. */
  final case class TextScores(nBigrams: Long, totalMillibits: Long)

  /** The external-scorer contract: tokenize + score one document.
    * Construction happens on the executor via the factory (see
    * [[scoreSafe]]); throw on malformed input — the caller quarantines.
    */
  trait TextScorer {
    def score(text: String): TextScores
  }

  /** The q192 bigram LM in LOCAL form: same tokenizer (lowercase
    * letter-run split), same add-one surprisal
    * `bits(w1,w2) = mlog2(c1 + V) - mlog2(c12 + 1)`, same integer
    * milli-log2 kernel (bit length + one-shift interpolation) —
    * bit-for-bit the join-based [[NgramLm.score]].
    */
  /** THE scalar exact-integer milli-log2 kernel — the one copy every
    * local scorer shares ([[BigramLmScorer]] here, `LangId.LocalScorer`
    * for routing): the kernel's exactness is the engine's cross-engine
    * equality contract, and two drifting copies would silently break
    * bit-equality between serving legs. Mirrors the SQL-side
    * `OracleCtes.milliLog2` / the inlined bin/shiftright expression.
    */
  private[operators] def milliLog2(x: Long): Long = {
    val bl = 63 - java.lang.Long.numberOfLeadingZeros(x) // = length(bin(x)) - 1
    bl * 1000L + ((x * 1000L) >> bl) - 1000L
  }

  final class BigramLmScorer(val unigrams: Map[String, Long],
                             val bigrams: Map[(String, String), Long],
                             val vocab: Long) extends TextScorer with Serializable {
    private def mlog2(x: Long): Long = TextModelSeam.milliLog2(x)
    def score(text: String): TextScores = {
      val ts = text.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z]+", -1).filter(_.nonEmpty)
      if (ts.length < 2) return TextScores(0L, 0L)
      var total = 0L
      var i = 0
      while (i < ts.length - 1) {
        val c1 = unigrams.getOrElse(ts(i), 0L)
        val c12 = bigrams.getOrElse((ts(i), ts(i + 1)), 0L)
        total += mlog2(c1 + vocab) - mlog2(c12 + 1L)
        i += 1
      }
      TextScores(ts.length - 1L, total)
    }
  }

  /** Collect an [[NgramLm.Model]] into the scorer's local form — the
    * fixture-scale sufficiency proof, and the producer side of the
    * artifact leg (localize once on the driver, [[saveScorer]] to a
    * file, score with [[fileScorerFactory]] on the executors).
    * BOUNDED-BY-CONTRACT collect: the seam exists for models
    * that fit an executor (the pretrained-artifact deployment shape);
    * a corpus-sized self-trained table belongs on the join-based
    * [[NgramLm.score]] path instead.
    */
  def localize(model: NgramLm.Model): BigramLmScorer =
    new BigramLmScorer(
      model.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      model.bigrams.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      model.vocab)

  // ---- model artifact: the executor-local file leg -----------------

  /** Artifact magic + format version, "GLM1" as a big-endian int. */
  private val ArtifactMagic = 0x474C4D31

  /** Serialize a [[BigramLmScorer]] to a compact binary artifact:
    * magic, CRC32 of the payload, payload length, then the payload —
    * vocab size, the unigram table SORTED by word, the bigram table
    * SORTED by (w1, w2); counts integer-exact, strings in modified
    * UTF-8. Sorted tables make identical models produce byte-identical
    * artifacts; integer exactness makes the round-trip bit-for-bit
    * (TextModelSeamSpec pins both). The in-memory staging is fine by
    * the seam's contract — the artifact is executor-sized.
    */
  def saveScorer(scorer: BigramLmScorer, path: String): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    // modified-UTF-8 entries carry a 16-bit length prefix; a token over
    // 65535 encoded bytes would throw a bare UTFDataFormatException from
    // writeUTF mid-stream — check up front with a named failure instead
    // (the tokenizer's letter-run tokens are ASCII, so encoded length ==
    // char length; a >64 KiB "word" is corrupt input, not a model)
    def checkedUtf(w: String): String = {
      require(w.length <= 65535,
        s"saveScorer: token of ${w.length} chars exceeds the 65535-byte " +
          "modified-UTF-8 entry limit — not a plausible word token")
      w
    }
    d.writeLong(scorer.vocab)
    val uni = scorer.unigrams.toSeq.sortBy(_._1)
    d.writeInt(uni.size)
    uni.foreach { case (w, c) => d.writeUTF(checkedUtf(w)); d.writeLong(c) }
    val bi = scorer.bigrams.toSeq.sortBy(_._1)
    d.writeInt(bi.size)
    bi.foreach { case ((w1, w2), c) =>
      d.writeUTF(checkedUtf(w1)); d.writeUTF(checkedUtf(w2)); d.writeLong(c)
    }
    d.flush()
    val payload = bos.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path))))
    try {
      out.writeInt(ArtifactMagic)
      out.writeLong(crc.getValue)
      out.writeInt(payload.length)
      out.write(payload)
    } finally out.close()
  }

  /** Load a [[saveScorer]] artifact, verifying magic and CRC32 before
    * trusting a byte of it: a corrupted, truncated, or foreign file
    * fails LOUDLY at load time — once per partition, at task start —
    * never as silently wrong scores fanned out over a corpus.
    */
  def loadScorer(path: String): BigramLmScorer = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // the 16-byte header (magic + CRC + length) must be present before a
    // single readInt — a shorter file would otherwise throw a bare
    // EOFException ahead of the path-named checks below
    require(bytes.length >= 16,
      s"$path is not a bigram-LM artifact (${bytes.length} bytes, header needs 16)")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = in.readInt()
    require(magic == ArtifactMagic,
      f"$path is not a bigram-LM artifact (magic 0x$magic%08X)")
    val crcStored = in.readLong()
    val len = in.readInt()
    require(len == bytes.length - 16,
      s"$path: truncated or padded artifact (payload $len declared, " +
        s"${bytes.length - 16} present)")
    val payload = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    require(crc.getValue == crcStored,
      s"$path: artifact CRC mismatch — refusing to score with a corrupted model")
    val p = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    val vocab = p.readLong()
    val uni = (0 until p.readInt()).map(_ => p.readUTF() -> p.readLong()).toMap
    val bi = (0 until p.readInt())
      .map(_ => (p.readUTF(), p.readUTF()) -> p.readLong()).toMap
    new BigramLmScorer(uni, bi, vocab)
  }

  /** The deployment-shape factory the per-partition discipline exists
    * for: each partition loads the model from an EXECUTOR-LOCAL
    * artifact path (shipped via `--files`, a mounted volume, or a
    * distributed cache), once, at task start — nothing model-sized is
    * serialized from the driver into the task closure (the closure
    * captures only the path string).
    */
  def fileScorerFactory(path: String): () => TextScorer =
    () => loadScorer(path)

  final case class SafeTextScore(doc_id: Long, ok: Boolean, error: String,
                                 n_bigrams: Long, total_millibits: Long,
                                 avg_millibits: Long)

  /** Quarantining scorer over the seam: score every `(doc_id, text)`
    * row with a scorer built ONCE per partition from `mkScorer`. A row
    * whose scoring throws yields a single `ok = false` row with the
    * error — never an exception out of the task. `avg_millibits` is the
    * same `total div n, 0 when n = 0` the q192 row emits.
    */
  def scoreSafe(docs: Dataset[(Long, String)], mkScorer: () => TextScorer)
               (implicit spark: SparkSession): Dataset[SafeTextScore] = {
    import spark.implicits._
    docs.mapPartitions { rows =>
      // model/tokenizer initialization happens HERE, once per partition
      val scorer = mkScorer()
      rows.map { case (id, text) =>
        try {
          val s = scorer.score(text)
          SafeTextScore(id, ok = true, error = "", s.nBigrams, s.totalMillibits,
            if (s.nBigrams > 0) s.totalMillibits / s.nBigrams else 0L)
        } catch {
          case scala.util.control.NonFatal(e) =>
            SafeTextScore(id, ok = false,
              error = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}",
              n_bigrams = -1L, total_millibits = -1L, avg_millibits = -1L)
        }
      }
    }
  }
}
