package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end LLM-corpus pipeline rows: in-engine language
  * identification (q219 — CCNet stage 1, the upstream router every
  * per-language operator in this engine previously took as a recorded
  * column), plus the cross-stage composition rows that prove the stage
  * BOUNDARIES (id spaces, coordinates, normalization flags), not just
  * the stages.
  */
object PipelineQueries {

  // language-ID model + prediction frame, memoized per session (the
  // lmModel/lmScores discipline): the fixture never varies, training is
  // the expensive half, and q219/q220 share the artifacts; released via
  // clearCaches
  private val modelCache =
    scala.collection.mutable.Map.empty[SparkSession, graft.operators.LangId.Model]
  private def langidModel(s: SparkSession): graft.operators.LangId.Model =
    synchronized {
      modelCache.getOrElseUpdate(s, {
        val docs = s.read.parquet(LangIdFixture.ensure(s))
        graft.operators.LangId.train(
          docs.filter(col("doc_id") % 1000 < 40 && col("doc_id") < 9000),
          n = 2,
          prepare = _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      })
    }

  // the fixture's self-trained bigram LM score frame (the q192 shape on
  // the langid corpus): ONE score pass shared by the q219 tercile
  // machinery and any reuse; persisted + released like lmScores
  private val lmCache =
    scala.collection.mutable.Map.empty[SparkSession, graft.operators.NgramLm.Model]
  private val lmScoreCache =
    scala.collection.mutable.Map.empty[SparkSession, DataFrame]
  private def fixtureLmScores(s: SparkSession): DataFrame = synchronized {
    lmScoreCache.getOrElseUpdate(s, {
      val docs = s.read.parquet(LangIdFixture.ensure(s))
      val m = lmCache.getOrElseUpdate(s, graft.operators.NgramLm.train(docs,
        prepare = _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
      graft.operators.NgramLm.score(docs, m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
  }

  private[queries] def clearCaches(): Unit = synchronized {
    modelCache.values.foreach { m =>
      m.counts.unpersist()
    }
    modelCache.clear()
    lmCache.values.foreach { m => m.unigrams.unpersist(); m.bigrams.unpersist() }
    lmCache.clear()
    lmScoreCache.values.foreach(_.unpersist())
    lmScoreCache.clear()
  }

  def queries: Seq[Q] = Seq(

    Q(
      "q219_langid_buckets",
      (s, _) => {   // dedicated multilingual fixture; dir arg unused
        import s.implicits._
        // IN-ENGINE LANGUAGE IDENTIFICATION ROUTING THE CCNET MACHINERY
        // (Wenzek et al. 2020 §4.2 + §4.4): stage 1 of the published
        // pipeline is a language classifier — every per-language
        // operator downstream (q214 terciles, q215 fertility) is keyed
        // by ITS output, not by a recorded column. This row runs that
        // composition end to end on the multilingual fixture: train the
        // char-bigram NB classifier on the labeled train split (i < 40
        // per language block), PREDICT over the whole corpus (held-out
        // docs + the planted edges), then key the q214 tercile
        // machinery on the PREDICTED language. The planted edges ride
        // along: doc 9901 is all-OOV (Greek script — every bigram
        // unseen by every language), and because the fixture pins every
        // train doc to exactly DocChars code points, all five language
        // totals are equal, the five scores tie EXACTLY, and the
        // deterministic struct-sort tie-break assigns the
        // alphabetically-first language with margin 0; doc 9902 is a
        // mixed en/es doc whose margin is small but nonzero — the
        // low-confidence routing signal real pipelines threshold.
        // Plan shape: the model is vocabulary-sized (broadcast both
        // tables), scoring is one scan + per-doc gram agg + one
        // (doc, lang) agg; the cut table is |languages|-row broadcast
        // and the tag map-side (the q214 scale argument, unchanged
        // under a predicted key). Oracle replays EVERYTHING: per-lang
        // count CTEs, the shared milli-log2 kernel, argmin with the
        // (total, lang) tie-break, the runner-up margin, the fixture
        // LM, and both tercile cuts per PREDICTED language.
        val docs = s.read.parquet(LangIdFixture.ensure(s))
        val pred = graft.operators.LangId.predict(docs, langidModel(s))
        val scored = pred.select($"doc_id", $"pred_lang".as("lang"))
          .join(fixtureLmScores(s).select($"doc_id", $"avg_millibits"), Seq("doc_id"))
        val cuts = CurationQueries.ccnetCuts(scored)
        CurationQueries.ccnetTag(scored, cuts)
          .join(pred.select($"doc_id", $"margin_millibits"), Seq("doc_id"))
          .select($"doc_id", $"lang", $"margin_millibits", $"avg_millibits", $"bucket")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH lsrc AS (
          SELECT doc_id, lang, text
          FROM read_parquet('${LangIdFixture.Root}/*.parquet')),
        ltr AS (SELECT lang, text FROM lsrc
                WHERE doc_id % 1000 < 40 AND doc_id < 9000),
        ltg AS (SELECT lang, UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text)),
                  i -> SUBSTRING(text, i, 2))) AS g FROM ltr),
        lcnt AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
                 FROM ltg GROUP BY 1, 2),
        ltot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot
                 FROM lcnt GROUP BY 1),
        lvoc AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS v FROM ltg),
        ldg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS k
                FROM (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(text)),
                        i -> SUBSTRING(text, i, 2))) AS g FROM lsrc) t
                GROUP BY 1, 2),
        lpersc AS (
          SELECT ids.doc_id, t.lang,
                 CAST(COALESCE(SUM(k * (${OracleCtes.milliLog2("tot + v")}
                   - ${OracleCtes.milliLog2("COALESCE(c.c, 0) + 1")})), 0) AS BIGINT) AS total
          FROM (SELECT doc_id FROM lsrc) ids
          CROSS JOIN ltot t
          CROSS JOIN lvoc
          LEFT JOIN ldg ON ldg.doc_id = ids.doc_id
          LEFT JOIN lcnt c ON c.lang = t.lang AND c.g = ldg.g
          GROUP BY 1, 2),
        lrank AS (SELECT doc_id, lang, total,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY total, lang) AS rn
                  FROM lpersc),
        lpred AS (SELECT r1.doc_id, r1.lang AS lang,
                         CAST(COALESCE(r2.total - r1.total, 0) AS BIGINT)
                           AS margin_millibits
                  FROM lrank r1
                  LEFT JOIN lrank r2 ON r1.doc_id = r2.doc_id AND r2.rn = 2
                  WHERE r1.rn = 1),
        ${OracleCtes.bigramLm(trainSource = "lsrc", scoreSource = "lsrc")},
        lcuts AS (SELECT p.lang,
                         QUANTILE_CONT(sc.avg_millibits, 1.0/3) AS cut_head,
                         QUANTILE_CONT(sc.avg_millibits, 2.0/3) AS cut_middle
                  FROM lpred p JOIN lmsc sc USING (doc_id)
                  GROUP BY 1)
        SELECT p.doc_id, p.lang, p.margin_millibits, sc.avg_millibits,
               CASE WHEN sc.avg_millibits <= c.cut_head THEN 'head'
                    WHEN sc.avg_millibits <= c.cut_middle THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM lpred p
        JOIN lmsc sc USING (doc_id)
        JOIN lcuts c USING (lang)
        ORDER BY p.doc_id"""),
      doc = "In-engine language identification routing the CCNet machinery: a char-bigram multinomial NB classifier (exact integer milli-log2 surprisal, add-one floor over the global gram vocabulary, no class prior) trained on the fixture's labeled split PREDICTS every doc's language — argmin with deterministic (total, lang) tie-break and a runner-up-margin confidence column — and the q214 per-language tercile machinery keys on the PREDICTED assignment; planted edges: an all-OOV Greek doc ties all five languages exactly (equal train totals by construction) and resolves by tie-break at margin 0, and a mixed en/es doc carries a small nonzero margin; oracle replays classifier, tie-break, margin, LM, and both tercile cuts."))

  /** Deterministic multilingual corpus for the language-ID family:
    * five languages with genuinely distinct character distributions
    * (umlauts/ß-adjacent German clusters, English th/ing/tion,
    * Spanish ción/ñ, French eau/ç/é, BMP CJK for Chinese — all
    * precomposed NFC code points, so Spark and DuckDB index the same
    * code-point stream). Ids are `langIdx * 1000 + i`; `i < 40` is the
    * labeled train split, `i in [40, 60)` the held-out eval docs.
    * EVERY doc is exactly [[DocChars]] code points, so each language's
    * train total is exactly `40 * (DocChars - 1)` bigram instances —
    * the equal-mass construction the q219 exact-tie edge relies on.
    * Two planted edges outside every block: 9901 (Greek script — all
    * grams OOV in every language) and 9902 (mixed en/es — low-margin
    * ambiguous). The oracle replays from the written parquet, so
    * generation here need not be SQL-expressible.
    */
  object LangIdFixture {
    val Root = "/root/repo/target/langid_fixture"
    val DocChars = 140
    private def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    private def pick(n: Int, seed: Long): Int =
      java.lang.Math.floorMod(mix(seed), n.toLong).toInt
    private val Syllables: Map[String, IndexedSeq[String]] = Map(
      "de" -> Vector("sch", "ung", "ein", "ver", "über", "öch", "äus",
        "zwi", "ich", "der"),
      "en" -> Vector("the", "ing", "tion", "ough", "wh", "ea", "ly",
        "and", "er", "of"),
      "es" -> Vector("ción", "que", "ñas", "ado", "illa", "está",
        "ente", "los", "jo", "uy"),
      "fr" -> Vector("eau", "oux", "ché", "les", "été", "àla", "çon",
        "oi", "eur", "une"),
      "zh" -> Vector("数据", "处理", "引擎", "查询", "分布", "计算",
        "存储", "模型", "语言", "文本"))
    private val Langs = Vector("de", "en", "es", "fr", "zh")
    private def word(lang: String, seed: Long): String = {
      val inv = Syllables(lang)
      val k = 2 + pick(2, seed)
      (0 until k).map(j => inv(pick(inv.size, seed * 31 + j + 1))).mkString
    }
    /** Exactly [[DocChars]] code points: words joined by single spaces,
      * truncated (all syllable chars are BMP, so StringBuilder length ==
      * code points).
      */
    private def text(lang: String, docSeed: Long): String = {
      val sb = new StringBuilder
      var w = 0
      while (sb.length < DocChars + 16) {
        if (w > 0) sb.append(' ')
        sb.append(word(lang, docSeed * 131 + w))
        w += 1
      }
      sb.substring(0, DocChars)
    }
    private def rows: Seq[(Long, String, String)] = {
      val main = for {
        (l, li) <- Langs.zipWithIndex
        i <- 0 until 60
      } yield ((li * 1000 + i).toLong, l, text(l, li * 7919L + i))
      // 9901: Greek — every bigram OOV in every language -> exact
      // five-way tie (equal train totals), resolved by tie-break
      val oov = (9901L, "xx",
        "αβ γδε ζηθ ικλ μνξ οπρ στυ φχψ ωαβ γδε ζηθ ικλ")
      // 9902: half en / half es words — genuinely ambiguous, small
      // nonzero margin
      val mixed = (9902L, "xx",
        ((0 until 6).map(j => word("en", 555L + j)) ++
          (0 until 6).map(j => word("es", 777L + j))).mkString(" "))
      main ++ Seq(oov, mixed)
    }
    private val once = new FixtureOnce(Root)
    def ensure(s: SparkSession): String =
      once.ensure3(s)(rows, "doc_id", "lang", "text")
  }
}
