package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Script-mix / code-switching classification — ONE definition shared by
  * the batch gate row (q182), the batch routing aggregate, and the
  * streaming routing twin (StreamingSpec pins batch == streaming
  * exactly, the three-implementation discipline).
  *
  * Per document: per-class token counts over the unicode token stream
  * (ideograph unigrams vs digit runs vs letter runs), an exact integer
  * permille ideograph fraction, and a dominant class with a fixed tie
  * order — the model-free curation feature that routes multilingual
  * documents (per-language caps, mixed-script spam filters). Class
  * regexes are GENERATED from the same
  * [[graft.functions.UniTok]] range constants as the tokenizer; integer
  * permille keeps the q182 gate bitwise across engines.
  *
  * Scale shape: classification is a per-row scalar inside whole-stage
  * codegen (no shuffle); routing is a groupBy on a ≤3-value key whose
  * partial aggregation collapses map-side — streaming state is one row
  * per class, O(1) regardless of stream length.
  */
object ScriptMix {

  /** Per-document classification columns appended after `keep`. */
  def classify(docs: DataFrame, textCol: String = "txt",
               keep: Seq[String] = Seq("doc_id")): DataFrame = {
    val ideoRe = graft.functions.UniTok.oracleRegex.split("\\|")(0) // the ideo class
    val ideoPat = s"^$ideoRe$$".replace("\\", "\\\\")
    docs
      .select((keep.map(col) :+ graft.functions.TextFns.uniTokens(col(textCol)).as("toks")): _*)
      .select((keep.map(col) :+
        size(col("toks")).cast("long").as("n_tokens") :+
        expr(s"cast(size(filter(toks, t -> t rlike '$ideoPat')) as bigint)").as("n_ideo") :+
        expr("cast(size(filter(toks, t -> t rlike '^[0-9]+$')) as bigint)").as("n_digit")): _*)
      .withColumn("n_alpha", col("n_tokens") - col("n_ideo") - col("n_digit"))
      .withColumn("ideo_pm", expr(
        "case when n_tokens = 0 then 0L else (n_ideo * 1000) div n_tokens end"))
      .withColumn("main_class", expr(
        "case when n_ideo >= n_alpha and n_ideo >= n_digit then 'ideo' " +
          "when n_alpha >= n_digit then 'alpha' else 'digit' end"))
  }

  /** Routing aggregate: per dominant class, document and per-class token
    * totals. On a stream this runs in COMPLETE output mode as an
    * ordinary streaming aggregation — the accumulating router's view
    * (which language caps are filling) with ≤3 rows of state.
    */
  def routeCounts(docs: DataFrame, textCol: String = "txt"): DataFrame =
    classify(docs, textCol, keep = Seq.empty)
      .groupBy(col("main_class"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_ideo")).as("total_ideo"),
        sum(col("n_digit")).as("total_digit"))
}
