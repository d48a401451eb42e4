package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.BpeEncodeExpr

/** Sub-word (BPE) tokenization with a FIXED merges table — the
  * tokenize-for-real step ahead of sequence packing: q42 packs by
  * whitespace token counts, q141 packs by the counts THIS tokenizer
  * produces, which is what a pretraining batch assembler actually needs
  * (budgets are model-tokenizer tokens, not words).
  *
  * The merges table is a fixed, rank-ordered artifact shipped as a
  * literal into the codegen'd expression — exactly how production
  * tokenizers deploy (GPT-2's merges.txt is a frozen file, not
  * per-corpus state). Rules may reference the OUTPUT of earlier rules
  * (`t h`→`th`, then `th e`→`the`, then `the </w>`→`the</w>`), giving
  * real multi-level sub-word structure; words outside the covered set
  * split into genuine sub-word pieces. Encode semantics (rank-ordered
  * single replace passes over a space-delimited symbol string) are
  * documented on [[graft.functions.BpeCodec]] and are REPLAYABLE in
  * DuckDB as a REPLACE chain generated from the SAME Scala constant —
  * one definition, two engines, zero drift ([[oracleEncodeSql]]).
  *
  * Scale shape: encoding is a pure per-row scalar inside whole-stage
  * codegen (no shuffle, no state); the merges array is plan metadata.
  * At 100 TB the tokenize pass pipelines with whatever scan feeds it.
  */
object Bpe {

  /** Rank-ordered merge rules. Tuned to the corpus' lowercase-ASCII
    * vocabulary so high-frequency words collapse to single tokens while
    * the tail stays multi-piece — the realistic BPE outcome. Each rule
    * merges two EXISTING symbols (base chars, earlier outputs, or the
    * `</w>` marker) and is validated by BpeEncodeExpr's constructor.
    */
  val StandardMerges: Seq[(String, String)] = Seq(
    // common bigrams
    "t h" -> "th", "i n" -> "in", "e r" -> "er", "a n" -> "an",
    "o r" -> "or", "a t" -> "at", "s t" -> "st", "o w" -> "ow",
    "e y" -> "ey", "e a" -> "ea", "l o" -> "lo", "u e" -> "ue",
    // the
    "th e" -> "the", "the </w>" -> "the</w>",
    // join
    "j o" -> "jo", "jo in" -> "join", "join </w>" -> "join</w>",
    // scan
    "s c" -> "sc", "sc an" -> "scan", "scan </w>" -> "scan</w>",
    // data
    "d a" -> "da", "da t" -> "dat", "dat a" -> "data", "data </w>" -> "data</w>",
    // row / window tail
    "r ow" -> "row", "row </w>" -> "row</w>", "d ow" -> "dow",
    // key
    "k ey" -> "key", "key </w>" -> "key</w>",
    // batch
    "b at" -> "bat", "bat c" -> "batc", "batc h" -> "batch", "batch </w>" -> "batch</w>",
    // sort
    "s or" -> "sor", "sor t" -> "sort", "sort </w>" -> "sort</w>",
    // stream
    "st r" -> "str", "str ea" -> "strea", "strea m" -> "stream", "stream </w>" -> "stream</w>",
    // fast
    "f a" -> "fa", "fa st" -> "fast", "fast </w>" -> "fast</w>",
    // merge
    "m er" -> "mer", "mer g" -> "merg", "merg e" -> "merge", "merge </w>" -> "merge</w>",
    // frequent suffixes
    "er </w>" -> "er</w>", "e </w>" -> "e</w>", "t </w>" -> "t</w>",
    "s </w>" -> "s</w>", "a </w>" -> "a</w>", "p </w>" -> "p</w>")

  /** Codegen'd encode: text → space-joined sub-word tokens, each word's
    * last token carrying the `</w>` marker.
    */
  def encode(text: Column): Column = BpeEncodeExpr(text, StandardMerges)

  /** True token count of an [[encode]] output ("" → 0). */
  def tokenCount(tokens: Column): Column =
    when(length(tokens) === 0, 0L)
      .otherwise(size(split(tokens, " ")).cast("long"))

  /** DuckDB replay of [[encode]] for ONE word expression: symbolization
    * (per-character slice + `</w>`) wrapped in the REPLACE chain
    * generated from [[StandardMerges]] — the oracle executes the same
    * rank-ordered passes because both sides are generated from this one
    * constant. Returns an expression yielding the TRIMMED encoded word.
    */
  def oracleEncodeSql(wordExpr: String): String = {
    val sym = s"' ' || ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, LENGTH($wordExpr) + 1), " +
      s"i -> $wordExpr[i:i]), ' ') || ' </w> '"
    val chained = StandardMerges.foldLeft(sym) { case (acc, (p, r)) =>
      s"REPLACE($acc, ' $p ', ' $r ')"
    }
    s"TRIM($chained)"
  }
}
