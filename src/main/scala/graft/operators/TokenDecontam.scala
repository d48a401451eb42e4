package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TOKEN-level exact decontamination — the published contamination
  * methodology verbatim: GPT-3's appendix C and PaLM both define a
  * benchmark leak as a shared 13-GRAM OF TOKENIZER TOKENS, not of
  * characters (Brown et al. 2020 §C; Chowdhery et al. 2022 §7). The
  * char-level tier (q208, [[SubstrDedup.contaminationSpans]]) needs
  * L=40 code points of verbatim overlap; a short token-DENSE leak —
  * out-of-vocabulary strings that explode into many sub-word pieces,
  * the classic benchmark-id/key shape — can carry 13+ tokens in under
  * 20 characters and sail straight through the char threshold
  * (TokenDecontamSpec plants exactly that). This operator closes the
  * gap: every maximal run of TRAIN-doc token positions whose n-token
  * window occurs verbatim in ANY benchmark doc, reported in TOKEN
  * coordinates.
  *
  * Tokenization is the q140 BPE encoder ([[Bpe.encode]], the frozen
  * rank-ordered merges table as one codegen'd scalar) — which is what
  * makes the whole pass DuckDB-replayable: the oracle re-derives the
  * token streams through the REPLACE chain generated from the same
  * Scala constant, then replays the window join and the island union.
  *
  * Scale shape: tokenize is per-row scalar; window keys are md5 of the
  * n-token slice (one row per token position — ~20x FEWER rows than the
  * char tier's per-character windows, which is why no anchor-pruning
  * pass is needed here); the benchmark's DISTINCT window set is small
  * by definition, so the semi-join broadcasts it and the train side
  * filters MAP-SIDE — the corpus is never exchanged. The only shuffle
  * is the per-doc island window over the (subset-bounded) hit
  * positions, exactly [[SubstrDedup]]'s span machinery at token
  * granularity.
  */
object TokenDecontam {

  /** The published contamination window: 13 tokens (GPT-3/PaLM). */
  val DefaultN = 13

  /** Per-doc BPE token array (empty for empty/whitespace docs). */
  private def tokenArrays(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      filter(split(Bpe.encode(col(textCol)), " "), t => t =!= "").as("ts"))

  /** One row per n-token window: (doc_id, pos, g) with 1-based token
    * position and g = md5 of the space-joined window content.
    */
  private def windowRows(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    tokenArrays(docs, idCol, textCol)
      .select(col("doc_id"), col("ts"), explode(expr(
        s"if(size(ts) >= $n, sequence(1, size(ts) - $n + 1), array())")).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", expr(s"slice(ts, pos, $n)")).cast("binary")).as("g"))

  /** Maximal contaminated TOKEN spans per train doc: position p of a
    * train doc is contaminated iff it lies inside some n-token window
    * whose content occurs verbatim in any `bench` doc; maximal runs
    * merge through the char tier's island rule at token granularity
    * (coverages [p, p+n-1] overlap or touch). Output one row per span:
    * (doc_id, span_idx, span_start, span_end, span_len), all in TOKEN
    * coordinates of the q140 BPE stream. Train/bench id spaces are
    * never joined, so overlapping ids are harmless.
    */
  def contaminationTokenSpans(train: DataFrame, bench: DataFrame,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              n: Int = DefaultN): DataFrame = {
    require(n >= 2, s"a $n-token window is not a contamination test")
    val bg = windowRows(bench, idCol, textCol, n).select(col("g")).distinct()
    val hits = windowRows(train, idCol, textCol, n)
      .join(bg, Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos"))
    SubstrDedup.spansFromHits(hits, n)
  }
}
