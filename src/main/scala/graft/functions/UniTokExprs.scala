package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Unicode-aware text segmentation — the multilingual
  * tokenizer tier for the text operators (BM25, shingles, quality
  * scoring). The ASCII `[^a-z]+` split every text operator defaults to
  * degenerates on a real pretraining corpus: CJK text (no spaces, no
  * Latin letters) tokenizes to NOTHING and accented words fragment at
  * every diacritic. This segmenter fixes both with pure codepoint-class
  * rules — no ICU, no dictionaries, no locale state — so the SAME
  * text produces the SAME tokens on every executor, every engine,
  * every run (the property a 100 TB dedup/retrieval pipeline actually
  * needs from its tokenizer; linguistic perfection is not it).
  *
  * Rules (applied to each code point AFTER simple per-codepoint
  * lowercasing, `Character.toLowerCase(int)` — the locale-free 1:1
  * mapping):
  *   - an IDEOGRAPH-class code point (kana, CJK unified, hangul) is a
  *     token BY ITSELF — the standard unigram treatment for unsegmented
  *     scripts (CJK has no delimiters; per-char unigrams are the
  *     deterministic baseline retrieval/shingling builds on);
  *   - a WORD-class code point (digits, basic + accented Latin, Greek,
  *     Cyrillic — explicit ranges below) joins the current run;
  *   - anything else (punctuation, whitespace, symbols, emoji,
  *     unclassified scripts) terminates the run and emits nothing.
  *
  * The class tables are EXPLICIT codepoint ranges, not
  * `Character.getType`/`UnicodeScript` — so the DuckDB oracle can replay
  * segmentation with a regex GENERATED from the same Scala constants
  * ([[UniTok.oracleRegex]]): one definition, two engines, zero
  * classifier drift (the Bpe.oracleEncodeSql discipline). Astral code
  * points are iterated as code points on both sides (Java codePointAt /
  * RE2 codepoint classes).
  *
  * Oracle-compat note: both sides lowercase before classifying — Spark
  * with Java's simple mapping, DuckDB with `lower()`. These agree on
  * Latin/Greek/Cyrillic/CJK; locale-special cases where full and simple
  * case mappings diverge (e.g. U+0130 dotted capital I) are outside the
  * word ranges' uppercase preimages used in the gate fixture.
  *
  * Scale shape: a per-row scalar inside whole-stage codegen (the kernel
  * is one static JVM method, same pattern as BpeCodec) — no shuffle, no
  * state, pipelines with the scan that feeds it.
  */
object UniTok {

  /** One code point per token (unsegmented scripts): hiragana
    * (U+3041–U+3096 — U+3040/3097/3098 are unassigned), the SPACING
    * kana marks U+309B–U+309F (゛゜ゝゞゟ; the COMBINING voicing marks
    * U+3099/309A are excluded — they modify the preceding kana, and a
    * standalone combining mark is not content), katakana U+30A1–U+30FA
    * plus U+30FC–U+30FF (prolonged-sound mark, iteration marks, koto
    * digraph; the double hyphen U+30A0 and middle-dot separator U+30FB
    * are PUNCTUATION and excluded — as tokens they would pollute
    * shingles/fingerprints/BM25 on real Japanese text), CJK unified
    * ideographs (U+4E00–U+9FFF), hangul syllables (U+AC00–U+D7A3).
    */
  val IdeoRanges: Seq[(Int, Int)] = Seq(
    (0x3041, 0x3096), (0x309B, 0x309F), (0x30A1, 0x30FA), (0x30FC, 0x30FF),
    (0x4E00, 0x9FFF), (0xAC00, 0xD7A3))

  /** Run-forming classes, POST-lowercase: digits, a–z, Latin-1
    * lowercase letters (ß–ö, ø–ÿ; ÷ excluded), Latin Extended-A,
    * lowercase Greek incl. accented vowels and final sigma
    * (U+03AC–U+03CE), lowercase Cyrillic (а–я) plus the U+0450–U+045F
    * extensions (ё, Ukrainian і/ї/є, Serbian ј, …), Hebrew letters,
    * Arabic letters (caseless word scripts segment on their own
    * separators/spaces). Scripts outside every range (Thai, Devanagari,
    * …) are separators — they emit NO tokens, which downstream
    * fingerprints must treat as "unsegmentable", never as "empty
    * content" (see TextFns.fingerprintUni's fallback).
    */
  val WordRanges: Seq[(Int, Int)] = Seq(
    (0x30, 0x39), (0x61, 0x7A), (0xDF, 0xF6), (0xF8, 0xFF),
    (0x100, 0x17F), (0x3AC, 0x3CE), (0x430, 0x44F), (0x450, 0x45F),
    (0x5D0, 0x5EA), (0x620, 0x64A))

  def isIdeo(cp: Int): Boolean = {
    var i = 0
    while (i < IdeoRanges.length) {
      val r = IdeoRanges(i)
      if (cp >= r._1 && cp <= r._2) return true
      i += 1
    }
    false
  }

  def isWord(cp: Int): Boolean = {
    var i = 0
    while (i < WordRanges.length) {
      val r = WordRanges(i)
      if (cp >= r._1 && cp <= r._2) return true
      i += 1
    }
    false
  }

  /** The DuckDB/RE2 replay of the segmentation, generated from the SAME
    * range constants: `[ideo]|[word]+` — at an ideograph the first
    * alternative matches one code point; at a word char the greedy run
    * matches maximally; separators match nothing. Apply to
    * `lower(text)`.
    */
  def oracleRegex: String = {
    def cls(rs: Seq[(Int, Int)]): String = rs.map { case (lo, hi) =>
      if (lo == hi) f"\\x{$lo%04X}" else f"\\x{$lo%04X}-\\x{$hi%04X}"
    }.mkString("[", "", "]")
    cls(IdeoRanges) + "|" + cls(WordRanges) + "+"
  }

  /** Kernel shared by interpreted eval and generated code. */
  def segment(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val run = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val ocp = s.codePointAt(i)
      val cp = Character.toLowerCase(ocp)
      if (isIdeo(cp)) {
        if (run.length > 0) { out += UTF8String.fromString(run.toString); run.setLength(0) }
        out += UTF8String.fromString(new java.lang.StringBuilder(2).appendCodePoint(cp).toString)
      } else if (isWord(cp)) {
        run.appendCodePoint(cp)
      } else if (run.length > 0) {
        out += UTF8String.fromString(run.toString); run.setLength(0)
      }
      i += Character.charCount(ocp)
    }
    if (run.length > 0) out += UTF8String.fromString(run.toString)
    new GenericArrayData(out.toArray)
  }
}

/** Codegen'd `unicode_tokens(text) -> array<string>` (see [[UniTok]]). */
case class UniTokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unicode_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_tokens requires a STRING child, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UniTok.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UniTok.segment($c);")

  override protected def withNewChildInternal(newChild: Expression): UniTokenize =
    copy(child = newChild)
}

object UniTokenize {
  def apply(text: Column): Column =
    Bridge.column(UniTokenize(Bridge.expression(text)))
}
