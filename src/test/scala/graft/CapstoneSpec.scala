package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineQueries

/** Attributes at least one casualty to EVERY stage of the q220
  * crawl-to-packed-tokens chain, by name — the cross-stage contracts
  * (text versions, id spaces, coordinate systems) are the thing under
  * test; the q220 oracle pins the end-to-end values, this spec pins
  * WHERE each planted document or line died.
  */
class CapstoneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  private lazy val st = PipelineQueries.capstoneStages(spark)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("stage 1+2 (mux + ladder): extraction is the identity on every corpus doc — the template traps never leak") {
    // the page template plants a script saying "javascript" and a
    // comment carrying braces; if block removal failed or ran after the
    // <br> split, C4 would kill every doc downstream — here we pin the
    // sharper fact that WARC->HTTP->HTML extraction returns the exact
    // source text for all 74 corpus docs
    val src = st.corpus.select(col("doc_id"), col("text").as("src"))
    val diff = st.extracted.join(src, "doc_id")
      .filter(col("text") =!= col("src")).count()
    assert(diff == 0, "ladder extraction must round-trip every doc")
    assert(st.extracted.count() == st.corpus.count())
  }

  test("stage 3 (C4): doc 100 loses exactly its three bad lines; 101/102/103 die by lorem/brace/3-line rules") {
    val audit = st.c4Audit
      .select(col("doc_id"), col("n_lines"), size(col("kept")).as("kl"),
        col("lorem"), col("brace"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(audit(100L)._1 == 10L && audit(100L)._2 == 7,
      s"doc 100 must keep 7 of 10 lines: ${audit(100L)}")
    assert(audit(101L)._3, "doc 101 must trip the lorem rule")
    assert(audit(102L)._4, "doc 102 must trip the brace rule")
    assert(audit(103L)._2 == 2, "doc 103 must retain fewer than 3 lines")
    val after = ids(st.cleaned)
    assert(after.contains(100L) && !after.contains(101L) &&
      !after.contains(102L) && !after.contains(103L))
    // clean base docs lose nothing
    assert(audit(0L)._1 == 7L && audit(0L)._2 == 7)
  }

  test("stage 4 (NFC exact dedup): the NFD twin 111 dies, the NFC original 110 survives, texts byte-differ pre-normalization") {
    val pre = st.cleaned.filter(col("doc_id").isin(110L, 111L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pre(110L) != pre(111L), "twins must byte-differ before NFC")
    assert(java.text.Normalizer.normalize(pre(111L),
      java.text.Normalizer.Form.NFC) == pre(110L),
      "111 must be the NFD spelling of 110")
    val after = ids(st.cur)
    assert(after.contains(110L) && !after.contains(111L),
      "min-id election must keep 110 and drop 111")
  }

  test("stage 5 (substring spans): the shared-run hosts carry spans, clean docs none, and the permille threshold separates 120 from 121") {
    val spanDocs = ids(st.spans)
    assert(Set(120L, 121L, 130L, 131L).subsetOf(spanDocs),
      s"span hosts missing: $spanDocs")
    assert(!spanDocs.contains(0L) && !spanDocs.contains(100L),
      "clean docs must carry no spans")
    val man = st.manifest
      .select(col("doc_id"), col("substr_permille"), col("is_victim"),
        col("pass_gate"), col("has_pii"), col("avg_millibits"), col("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(man(120L)._1 > 300L && man(120L)._6 == 0L,
      s"120 must exceed 300 permille and be dropped: ${man(120L)}")
    assert(man(121L)._1 > 0L && man(121L)._1 <= 300L && man(121L)._6 == 1L,
      s"121 must carry spans under the threshold and be KEPT: ${man(121L)}")
  }

  test("stage 6 (token decontamination): 150 dies to bench doc 9001; the unique bench doc 9002 claims no one") {
    val dropped = ids(st.contaminated)
    assert(dropped == Set(150L),
      s"exactly doc 150 must be contaminated, got $dropped")
    assert(!ids(st.cur2).contains(150L))
    // specificity: 9002 shares no 13-token window with any corpus doc —
    // if it did, more than one doc would have been dropped above
  }

  test("stage 7 (manifest): each signal claims its planted doc by name") {
    val man = st.manifest
      .select(col("doc_id"), col("pass_gate"), col("has_pii"),
        col("is_victim"), col("substr_permille"), col("avg_millibits"),
        col("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(man(140L)._1 == 0L && man(140L)._6 == 0L, s"140 gate: ${man(140L)}")
    assert(man(141L)._2 == 1L && man(141L)._6 == 0L, s"141 pii: ${man(141L)}")
    assert(man(131L)._3 == 1L && man(131L)._6 == 0L, s"131 victim: ${man(131L)}")
    assert(man(5000L)._5 > PipelineQueries.CapLmMaxAvgMillibits &&
      man(5000L)._6 == 0L, s"5000 lm: ${man(5000L)}")
    // and the in-domain scores sit clearly below the threshold
    val keptScores = man.collect { case (id, m) if m._6 == 1L => m._5 }
    assert(keptScores.nonEmpty &&
      keptScores.max <= PipelineQueries.CapLmMaxAvgMillibits)
    // survivors are exactly the designed set
    val kept = man.collect { case (id, m) if m._6 == 1L => id }.toSet
    assert(kept == ((0L until 60L).toSet ++ Set(100L, 110L, 121L)),
      s"unexpected survivor set: ${kept -- (0L until 60L).toSet}")
  }

  test("stage 8 (packing): pack ids equal an independent prefix-sum fold; budget is respected within one doc") {
    val rows = st.packed
      .select(col("doc_id"), col("n_tok"), col("pack_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var before = 0L
    rows.foreach { case (id, n, pack) =>
      assert(pack == before / 1024L, s"doc $id: pack $pack != ${before / 1024L}")
      before += n
    }
    // every pack except possibly the last closes within budget + one doc
    val maxDoc = rows.map(_._2).max
    rows.groupBy(_._3).foreach { case (p, docs) =>
      assert(docs.map(_._2).sum <= 1024L + maxDoc,
        s"pack $p overruns budget by more than one straddling doc")
    }
  }

  // ---- q226: the LID-routed multilingual chain -----------------------
  // Same discipline over PipelineQueries.multiStages: the oracle pins
  // end-to-end values; these tests pin WHERE each planted page died —
  // including the ROUTING stage, the casualty class q220 cannot have.

  private lazy val ms = PipelineQueries.multiStages(spark)

  test("q226 stage 1+2: extraction round-trips every multilingual page — CJK and the NFD combining mark survive the WARC byte leg") {
    val src = ms.corpus.select(col("doc_id"), col("text").as("src"))
    val diff = ms.extracted.join(src, "doc_id")
      .filter(col("text") =!= col("src")).count()
    assert(diff == 0, "multilingual ladder extraction must round-trip")
    assert(ms.extracted.count() == ms.corpus.count())
  }

  test("q226 stage 3 (C4): page 8803 dies to the brace rule; 8804 loses exactly its unterminated line and survives") {
    val after = ids(ms.cleaned)
    assert(!after.contains(8803L), "8803 must die to the page brace rule")
    assert(after.contains(8804L), "8804 must survive its line casualty")
    val kept = ms.cleaned.filter(col("doc_id") === 8804L)
      .select("text").collect()(0).getString(0)
    assert(kept.split("\n").length == 5,
      "8804 must keep 5 of its 6 lines (the unterminated one dropped)")
  }

  test("q226 stage 4 (NFC dedup): the NFD twin 8802 dies, 8801 survives, texts byte-differ pre-normalization") {
    val pre = ms.cleaned.filter(col("doc_id").isin(8801L, 8802L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pre(8801L) != pre(8802L), "twins must byte-differ before NFC")
    assert(java.text.Normalizer.normalize(pre(8802L),
      java.text.Normalizer.Form.NFC) == pre(8801L),
      "8802 must be the NFD spelling of 8801")
    val after = ids(ms.cur)
    assert(after.contains(8801L) && !after.contains(8802L))
  }

  test("q226 stage 5 (ROUTING): the mixed en/es page falls under the per-gram margin threshold, routes 'und', and is DROPPED; every pure page routes to its authored language") {
    // the per-gram rule: margin >= RoutePerGramMillibits * (len - 1)
    val pred = ms.pred.join(ms.cur, "doc_id")
      .select(col("doc_id"), col("pred_lang"), col("margin_millibits"),
        (length(col("text")) - 1).cast("long").as("grams"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val t = PipelineQueries.RoutePerGramMillibits
    assert(pred(9901L)._2 < t * pred(9901L)._3,
      s"mixed page ${pred(9901L)} must fall under $t milli-bits/gram")
    assert(!ids(ms.routed).contains(9901L),
      "the routing casualty must not reach any per-language stage")
    // pure pages: prediction == authored language, margin clears the
    // per-gram threshold (the classifier was trained on a DIFFERENT
    // corpus — the LangIdFixture — so this is genuine held-out routing)
    val authored = ms.corpus.filter(col("doc_id") < 8000L)
      .select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    authored.foreach { case (id, lang) =>
      if (pred.contains(id)) { // dedup/C4 casualties are already gone
        assert(pred(id)._1 == lang, s"doc $id: ${pred(id)._1} != $lang")
        assert(pred(id)._2 >= t * pred(id)._3,
          s"doc $id ${pred(id)} under the per-gram route threshold")
      }
    }
  }

  test("q226 stage 6 (terciles on PREDICTED lang): the tag inventory is exactly the five routed languages") {
    val langs = ms.tagged.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("de", "en", "es", "fr", "zh"),
      s"tercile inventory must be the routed languages, got $langs")
  }

  test("q226 stage 7 (mixing): every non-empty (pred_lang, bucket) cell drops an over-budget tail; kept mass respects budget + one doc") {
    val cells = ms.tagged.join(
        ms.routed.select(col("doc_id"),
          graft.operators.Bpe.tokenCount(
            graft.operators.Bpe.encode(col("text"))).as("n_tok")),
        Seq("doc_id"))
      .select(col("lang"), col("bucket"), col("doc_id"), col("n_tok"))
      .collect().toSeq.map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val kept = ms.mixed
      .select(col("pred_lang"), col("bucket"), col("doc_id"), col("n_tok"))
      .collect().toSeq.map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def budget(b: String): Long = b match {
      case "head" => PipelineQueries.MultiHeadBudget
      case "middle" => PipelineQueries.MultiMiddleBudget
      case _ => PipelineQueries.MultiTailBudget
    }
    cells.foreach { case (cell @ (_, b), docs) =>
      val keptDocs = kept.getOrElse(cell, Seq.empty[(Long, Long)])
      assert(keptDocs.size < docs.size,
        s"cell $cell kept all ${docs.size} docs — budget never bit")
      val realized = keptDocs.map(_._2).sum
      val maxDoc = docs.map(_._2).max
      assert(realized < budget(b) + maxDoc,
        s"cell $cell realized $realized vs budget ${budget(b)}")
      assert(realized >= budget(b) || keptDocs.size == docs.size,
        s"cell $cell stopped at $realized before filling budget ${budget(b)}")
    }
  }
}
