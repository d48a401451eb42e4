package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine language identification — CCNet's stage 1 (Wenzek et al.
  * 2020 §4.2 routes every downstream per-language decision through a
  * fastText language classifier; a pipeline that cannot ASSIGN language
  * cannot route anything). This is the trainable replacement for the
  * q18 five-marker heuristic: a character-n-gram multinomial
  * Naive-Bayes classifier in the [[NgramLm]] exact-integer discipline,
  * so a DuckDB oracle replays every prediction bit-for-bit.
  *
  * Model: per-language char-n-gram counts `c_L(g)` with add-one
  * smoothing over the GLOBAL n-gram vocabulary V. Scoring minimizes
  * total surprisal (= maximizes likelihood; no class prior — the
  * training label distribution is a corpus-construction artifact, not
  * evidence about a new document):
  *
  *   bits_L(g) = log2((tot_L + V) / (c_L(g) + 1))        [milli-bits]
  *
  * summed over the document's n-gram INSTANCES; the predicted language
  * is the argmin with ties broken by language code ascending (struct
  * sort — deterministic on both engines), and the CONFIDENCE column is
  * the margin to the runner-up in milli-bits (0 = a pure tie; small =
  * ambiguous/mixed-language doc — the routing signal real pipelines
  * threshold before trusting the assignment). Both mlog2 arguments are
  * >= 1 and tot_L + V > c_L(g) + 1 - 1 (c <= tot, V >= 1), so every
  * per-gram value is a nonnegative exact BIGINT.
  *
  * 100 TB story: the model is VOCABULARY-sized, not corpus-sized
  * (fastText's LID model is a few MB for 176 languages) — counts and
  * totals broadcast, so scoring a corpus is one scan: per-doc gram
  * aggregation (map-side combinable on (doc, gram)), a broadcast join
  * against the model, and one (doc, lang) aggregation; no shuffle
  * carries document text. Training is one keyed aggregation over the
  * labeled set plus a distinct-count action for V.
  *
  * Persistence ([[save]]/[[load]]): the [[ArtifactStore]] leg — counts
  * and totals as manifest-gated parquet, `n` and `vocab` as manifest
  * scalars, written manifest-LAST; load refuses version/format/schema
  * skew by name, and [[requireCompatible]] refuses scoring with a
  * model whose `n` differs from the caller's expectation (a skewed n
  * silently extracts different grams and misroutes every document).
  */
object LangId {

  /** The trained classifier: per-(lang, gram) counts, per-lang totals,
    * the global n-gram vocabulary size, and the gram length.
    */
  final case class Model(counts: DataFrame, totals: DataFrame,
                         vocab: Long, n: Int)

  private[graft] val FormatName = "graft-langid"
  private[graft] val Version = 1

  // the q173/NgramLm fixed-point integer log2 kernel, inlined from
  // BUILT-IN expressions so the operator works in any SparkSession
  private def mlog2(x: String): String =
    s"((length(bin($x)) - 1) * 1000 + shiftright(($x) * 1000, length(bin($x)) - 1) - 1000)"

  /** Character n-gram INSTANCES per key row: `(keyCol, gram)`, one row
    * per position (code-point indexed on both engines — DuckDB
    * SUBSTRING/LENGTH and Spark substring/length agree on BMP text).
    * The `length >= n` guard matters: sequence(1, 0) is the DESCENDING
    * [1, 0], not empty (the NgramLm gotcha).
    */
  def charGrams(docs: DataFrame, keyCol: String, textCol: String,
                n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"char n-gram length $n out of range [1, 8]")
    docs.select(col(keyCol), col(textCol).as("__t"))
      .select(col(keyCol), explode(expr(
        s"if(length(__t) >= $n, transform(sequence(1, length(__t) - ${n - 1}), " +
          s"i -> substring(__t, i, $n)), array())")).as("gram"))
  }

  /** Train on a labeled corpus: one (lang, gram) aggregation, totals
    * derived from it, one distinct-count action for V. `prepare` is the
    * storage hook (the NgramLm.train discipline): it wraps counts
    * before the derived aggregations, so the V action, the totals
    * rollup, and every downstream score join share one extraction pass.
    */
  def train(docs: DataFrame, langCol: String = "lang",
            textCol: String = "text", n: Int = 2,
            prepare: DataFrame => DataFrame = identity): Model = {
    val counts = prepare(charGrams(docs, langCol, textCol, n)
      .groupBy(col(langCol).as("lang"), col("gram"))
      .agg(count(lit(1)).as("c")))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    Model(counts, totals, counts.select(col("gram")).distinct().count(), n)
  }

  /** Merge two models trained on DISJOINT labeled corpora (the
    * [[NgramLm.merge]] incremental-training story: a new labeled batch
    * trains batch-locally and folds in with one keyed aggregation —
    * the old corpus is never re-read). Counts add; totals and the
    * vocabulary re-derive from the merged counts (NOT vocab_a +
    * vocab_b — shared grams would double-count). Gram lengths must
    * match, refused by name otherwise. Exactness is spec-pinned:
    * train(A ∪ B) == merge(train(A), train(B)).
    */
  def merge(a: Model, b: Model,
            prepare: DataFrame => DataFrame = identity): Model = {
    require(a.n == b.n,
      s"cannot merge a ${a.n}-gram model with a ${b.n}-gram model — " +
        "their gram streams never matched")
    val counts = prepare(a.counts.unionByName(b.counts)
      .groupBy(col("lang"), col("gram")).agg(sum(col("c")).as("c")))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    Model(counts, totals, counts.select(col("gram")).distinct().count(), a.n)
  }

  /** Total surprisal per (doc, lang) in exact integer milli-bits —
    * every document gets a row for EVERY language (zero-gram docs score
    * 0 everywhere: no evidence). Plan shape: per-doc gram aggregation,
    * broadcast model joins, one (doc, lang) aggregation.
    */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val dg = charGrams(docs, idCol, textCol, model.n)
      .groupBy(col(idCol).as("doc_id"), col("gram"))
      .agg(count(lit(1)).as("k"))
    val scored = dg
      .crossJoin(broadcast(model.totals))
      .join(broadcast(model.counts), Seq("lang", "gram"), "left")
      .withColumn("bits", expr(
        s"${mlog2(s"tot + ${model.vocab}L")} - ${mlog2("coalesce(c, 0L) + 1L")}"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("k") * col("bits")).as("total_millibits"))
    docs.select(col(idCol).as("doc_id"))
      .crossJoin(broadcast(model.totals.select(col("lang"))))
      .join(scored, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("total_millibits"), lit(0L)).as("total_millibits"))
  }

  /** Argmin language per document plus the runner-up margin:
    * `(doc_id, pred_lang, best_millibits, margin_millibits)`. The
    * per-doc collect is |languages|-bounded (the q214 cut-table
    * argument — a language inventory is never corpus-scale), and the
    * struct sort (total asc, lang asc) is the deterministic tie-break
    * both engines share.
    */
  def predict(docs: DataFrame, model: Model, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    score(docs, model, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("total_millibits"), col("lang")))).as("r"))
      .select(col("doc_id"),
        col("r").getItem(0).getField("lang").as("pred_lang"),
        col("r").getItem(0).getField("total_millibits").as("best_millibits"),
        when(size(col("r")) > 1,
          col("r").getItem(1).getField("total_millibits")
            - col("r").getItem(0).getField("total_millibits"))
          .otherwise(lit(0L)).as("margin_millibits"))

  // ---- the SERVING leg: scalar-local scoring --------------------------

  /** The model in executor-local form — the SERVING shape (fastText LID
    * ships as one frozen in-memory model and scores each record
    * scalar-locally; a streaming router cannot run [[predict]]'s
    * multi-aggregation plan inside a micro-batch). `totals` is SORTED
    * by language so iteration order — and therefore the (total, lang)
    * tie-break — is deterministic and identical to the struct sort the
    * distributed path uses. The per-doc work is one gram-count map plus
    * |languages| fold passes; exact integer milli-log2 throughout, so
    * every prediction is bit-equal to [[predict]] (spec-pinned).
    */
  final class LocalScorer(val counts: Map[(String, String), Long],
                          val totals: Seq[(String, Long)],
                          val vocab: Long, val n: Int) extends Serializable {
    private def mlog2(x: Long): Long = TextModelSeam.milliLog2(x)
    /** `(pred_lang, best_millibits, margin_millibits)` — argmin with the
      * (total, lang) tie-break, margin 0 for a single-language model.
      * Grams are CODE-POINT indexed like Spark's substring/length in
      * [[charGrams]] (UTF-16 unit indexing would split surrogate pairs
      * on astral text and silently diverge from the batch path), and a
      * null text scores like the distributed plan's empty gram array
      * (no evidence -> tie-break first language, margin 0) instead of
      * crashing the serving task.
      */
    def predict(text: String): (String, Long, Long) = {
      val t = if (text == null) "" else text
      val k = scala.collection.mutable.HashMap.empty[String, Long]
      val cps = t.codePointCount(0, t.length)
      var off = 0
      var ci = 0
      while (ci + n <= cps) {
        val g = t.substring(off, t.offsetByCodePoints(off, n))
        k.update(g, k.getOrElse(g, 0L) + 1L)
        off = t.offsetByCodePoints(off, 1)
        ci += 1
      }
      var bestLang = ""; var best = Long.MaxValue; var second = Long.MaxValue
      totals.foreach { case (lang, tot) =>
        var total = 0L
        k.foreach { case (g, cnt) =>
          total += cnt * (mlog2(tot + vocab) -
            mlog2(counts.getOrElse((lang, g), 0L) + 1L))
        }
        // totals are sorted by lang, so a strict < keeps the FIRST
        // (alphabetically smallest) language on ties — the struct-sort
        // rule verbatim
        if (total < best) { second = best; best = total; bestLang = lang }
        else if (total < second) second = total
      }
      (bestLang, best, if (second == Long.MaxValue) 0L else second - best)
    }
  }

  /** Collect the model into its serving form. BOUNDED-BY-CONTRACT
    * collect (the [[TextModelSeam.localize]] argument verbatim): the
    * model is VOCABULARY-sized — fastText LID is a few MB for 176
    * languages — and the operator's whole premise is that it broadcasts.
    */
  def localize(model: Model): LocalScorer =
    new LocalScorer(
      model.counts.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      model.totals.collect().map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1).toSeq,
      model.vocab, model.n)

  /** The serving pass: broadcast the local scorer once, score each
    * `(doc_id, text)` row scalar-locally per partition — zero shuffles,
    * and the SAME code path runs unchanged inside a streaming
    * micro-batch (a stream cannot run [[predict]]'s groupBy chain; this
    * is the LID router's deployment shape, the [[CcnetServing.tag]]
    * argument). Output schema matches [[predict]].
    */
  def predictLocal(spark: SparkSession, docs: DataFrame,
                   scorer: LocalScorer, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val b = spark.sparkContext.broadcast(scorer)
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val s = b.value
        it.map { case (id, t) =>
          val (lang, best, margin) = s.predict(t)
          (id, lang, best, margin)
        }
      }
      .toDF("doc_id", "pred_lang", "best_millibits", "margin_millibits")
  }

  // ---- persistence (the ArtifactStore leg) ---------------------------

  /** Persist: counts + totals as manifest-gated parquet, n and vocab as
    * manifest scalars, manifest written LAST.
    */
  def save(model: Model, dir: String): Unit =
    ArtifactStore.commit(dir, FormatName, Version,
      Seq("counts" -> model.counts, "totals" -> model.totals)) { node =>
      node.put("n", model.n)
      node.put("vocab", model.vocab)
    }

  /** Load with every gate by name: manifest existence/format/version,
    * per-table `_SUCCESS` + schema equality, scalar presence.
    */
  def load(spark: SparkSession, dir: String): Model = {
    val m = ArtifactStore.manifest(dir, FormatName, Version,
      "language-ID model")
    def tab(name: String): DataFrame =
      ArtifactStore.table(spark, dir, m, name).getOrElse(
        throw new IllegalArgumentException(
          s"$dir: manifest lists no `$name` table — not a complete " +
            "language-ID model"))
    require(m.has("n") && m.has("vocab"),
      s"$dir/MANIFEST.json: missing the n/vocab scalars — a partial or " +
        "foreign manifest")
    Model(tab("counts"), tab("totals"),
      m.path("vocab").asLong(), m.path("n").asInt())
  }

  /** Refuse a gram-length-skewed model by name: a model trained at a
    * different n extracts different grams, joins to the add-one floor
    * everywhere, and silently degrades every prediction toward the
    * smallest-total language.
    */
  def requireCompatible(model: Model, n: Int): Unit =
    require(model.n == n,
      s"language-ID model was trained with ${model.n}-grams but this " +
        s"caller expects n=$n — gram streams cannot match; rebuild or load " +
        "the matching model")
}
