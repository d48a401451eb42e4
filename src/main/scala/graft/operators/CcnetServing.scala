package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CCNet SERVING PAIR as one artifact — Wenzek et al. 2020 deploy
  * exactly two frozen things together: the pretrained LM and the
  * per-language perplexity cutoffs estimated offline from it. They are
  * useless apart (a model without its cuts cannot bucket; cuts from a
  * DIFFERENT model silently mis-bucket everything), so the engine
  * persists them as ONE manifest-gated directory:
  *
  *   - `model.bin` — the [[TextModelSeam]] scorer blob (magic + CRC32
  *     framing, sorted tables, byte-identical re-saves);
  *   - `cuts/` — the (lang, cut_head, cut_middle) parquet table;
  *   - `MANIFEST.json` written LAST (the [[ArtifactStore]] discipline),
  *     recording the model's vocab so a blob swapped in from another
  *     artifact is refused BY NAME at load, not discovered as wrong
  *     buckets in production.
  *
  * Serving shape ([[tag]]): the scorer loads once per PARTITION from
  * the artifact (the [[TextModelSeam.fileScorerFactory]] discipline —
  * nothing model-sized in the task closure), rows score scalar-locally
  * with per-row quarantine, the cut table broadcasts, and the bucket is
  * a map-side CASE — zero shuffles over the corpus, which is why the
  * frozen pair is the published STREAMING deployment (re-estimating
  * terciles in-stream is unbounded state; CCnetPairSpec pins loaded
  * tags == batch tags bit-for-bit).
  */
object CcnetServing {

  final case class Pair(scorer: TextModelSeam.BigramLmScorer, cuts: DataFrame)

  private val FormatName = "graft-ccnet-pair"
  private val Version = 1

  /** A cuts row with a NULL cut value can never bucket anything — it is
    * a different defect from a MISSING language row (an empty tercile
    * estimation vs a skewed language inventory) and must be refused AT
    * THE ARTIFACT BOUNDARY by its own name (ADVICE r17: the old [[tag]]
    * guard misdiagnosed it as a missing row). The cuts table is
    * |languages|-row by contract, so the check is one tiny action.
    */
  private def requireCutsNonNull(cuts: DataFrame, where: String): Unit = {
    val bad = cuts.filter(col("cut_head").isNull || col("cut_middle").isNull)
      .select(col("lang")).limit(1).collect()
    require(bad.isEmpty,
      s"CcnetServing.$where: language `${
        if (bad.isEmpty) "" else Option(bad.head.get(0)).getOrElse("NULL")
      }` has a cuts row with a NULL cut value — its terciles were never " +
        "estimated (an empty or failed per-language estimation), and a " +
        "null cut buckets nothing; re-estimate cuts for that language or " +
        "drop it from the pair")
  }

  /** Persist the pair: blob first, cuts table + manifest via
    * [[ArtifactStore.commit]] (manifest LAST certifies both landed).
    */
  def save(dir: String, scorer: TextModelSeam.BigramLmScorer,
           cuts: DataFrame): Unit = {
    Seq("lang", "cut_head", "cut_middle").foreach(c =>
      require(cuts.columns.contains(c),
        s"cuts table is missing `$c` — not a ccnetCuts output " +
          s"(have: ${cuts.columns.mkString(", ")})"))
    requireCutsNonNull(cuts, "save")
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    TextModelSeam.saveScorer(scorer, root.resolve("model.bin").toString)
    ArtifactStore.commit(dir, FormatName, Version, Seq("cuts" -> cuts)) {
      node =>
        node.put("vocab", scorer.vocab)
        node.put("n_unigrams", scorer.unigrams.size)
        node.put("n_bigrams", scorer.bigrams.size)
    }
  }

  /** Load with every gate by name: manifest format/version, cuts
    * `_SUCCESS` + schema, blob magic/CRC, and the PAIRING check — the
    * manifest's recorded model identity must match the blob, so a
    * model.bin copied in from another artifact directory is refused
    * instead of silently bucketing with foreign cutoffs.
    */
  def load(spark: SparkSession, dir: String): Pair = {
    val m = ArtifactStore.manifest(dir, FormatName, Version,
      "CCNet serving pair")
    val cuts = ArtifactStore.table(spark, dir, m, "cuts").getOrElse(
      throw new IllegalArgumentException(
        s"$dir: manifest lists no `cuts` table — not a complete serving pair"))
    val blob = java.nio.file.Paths.get(dir, "model.bin")
    require(java.nio.file.Files.exists(blob),
      s"$dir has no model.bin — the pair's model half is missing " +
        "(cuts without their model cannot bucket anything)")
    val scorer = TextModelSeam.loadScorer(blob.toString)
    require(m.path("vocab").asLong() == scorer.vocab &&
        m.path("n_unigrams").asInt() == scorer.unigrams.size &&
        m.path("n_bigrams").asInt() == scorer.bigrams.size,
      s"$dir: model.bin does not match the manifest's recorded model " +
        s"identity (vocab ${scorer.vocab} vs ${m.path("vocab").asLong()}, " +
        s"tables ${scorer.unigrams.size}/${scorer.bigrams.size} vs " +
        s"${m.path("n_unigrams").asInt()}/${m.path("n_bigrams").asInt()}) — " +
        "a foreign blob was swapped in; cuts from a different model " +
        "silently mis-bucket every document")
    // re-gate non-nullness at load too: save() refuses to WRITE a null
    // cut, but a pair written by older code (or a hand-edited cuts
    // table) must still be refused here, not misdiagnosed downstream
    requireCutsNonNull(cuts, "load")
    Pair(scorer, cuts)
  }

  /** Per-partition scorer factory over a persisted pair directory —
    * the closure captures only the path string.
    */
  def scorerFactory(dir: String): () => TextModelSeam.TextScorer =
    TextModelSeam.fileScorerFactory(
      java.nio.file.Paths.get(dir, "model.bin").toString)

  /** The frozen-pair tagging pass: score each `(doc_id, lang, text)`
    * row with a per-partition scorer (quarantined — `ok = false` rows
    * are EXCLUDED from the tagged output and surface via
    * [[TextModelSeam.scoreSafe]] if the caller wants them), broadcast
    * the cut table, tag with the `<= cut` CASE (ties to the lower
    * bucket — the q214 rule verbatim). Zero corpus shuffles.
    *
    * A document whose `lang` has NO row in the cuts table fails BY
    * NAME (ADVICE r16): the pair's cuts are per-language, so a missing
    * language means the frozen pair was estimated on a different
    * language inventory than the corpus being tagged — an inner join
    * would shrink the corpus silently, the exact failure mode the
    * manifest pairing gate exists to refuse. The check is a map-side
    * CASE over the broadcast left join — still zero corpus shuffles.
    */
  def tag(spark: SparkSession, docs: DataFrame, cuts: DataFrame,
          mkScorer: () => TextModelSeam.TextScorer): DataFrame = {
    import spark.implicits._
    val scored = TextModelSeam.scoreSafe(
        docs.select(col("doc_id"), col("text")).as[(Long, String)],
        mkScorer)(spark)
      .filter(col("ok"))
      .select(col("doc_id"), col("avg_millibits"))
    // the marker column distinguishes "no row for this language" from
    // "a row whose cut VALUE is null" (ADVICE r17): a left join renders
    // both as null cuts, but they are different defects with different
    // fixes — the marker is non-null exactly when a cuts row matched.
    // [[save]]/[[load]] refuse null cut values at the artifact boundary;
    // this keeps the diagnosis honest for callers passing an in-session
    // cuts frame that never crossed the artifact gates.
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"))
      .join(broadcast(cuts.withColumn("__cut_row", lit(1L))),
        Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("avg_millibits"),
        when(col("__cut_row").isNull,
          raise_error(concat(
            lit("CcnetServing.tag: language `"),
            coalesce(col("lang"), lit("NULL")),
            lit("` (doc_id "), coalesce(col("doc_id").cast("string"), lit("NULL")),
            lit(") has no row in the pair's cuts table — the frozen " +
              "pair was estimated on a different language inventory " +
              "than this corpus; re-estimate cuts or route the " +
              "language out before tagging"))))
          .when(col("cut_head").isNull || col("cut_middle").isNull,
            raise_error(concat(
              lit("CcnetServing.tag: language `"),
              coalesce(col("lang"), lit("NULL")),
              lit("` has a cuts row with a NULL cut value — its " +
                "terciles were never estimated; re-estimate cuts for " +
                "that language (a null cut buckets nothing)"))))
          .when(col("avg_millibits") <= col("cut_head"), "head")
          .when(col("avg_millibits") <= col("cut_middle"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
