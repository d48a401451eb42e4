package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the fixed-merges BPE tokenizer — called from BOTH
  * the interpreted eval and the generated code (the standard Spark shape
  * for string kernels: the expression stays inside whole-stage codegen,
  * the loop lives in one static JVM method the JIT compiles once).
  *
  * Semantics (the cross-engine contract, chosen to be REPLAYABLE in
  * plain SQL and pinned by the q140 oracle):
  *   1. a document splits into words on single spaces (empty words from
  *      runs of spaces are dropped, matching STRING_SPLIT + LENGTH>0);
  *   2. each word symbolizes to its code points followed by the `</w>`
  *      end-of-word marker, as a space-delimited symbol string with one
  *      leading/trailing space;
  *   3. the merge rules apply in FIXED RANK ORDER, each as ONE
  *      left-to-right non-overlapping replace-all over the delimited
  *      string (` a b ` → ` ab `) — exactly `java.lang.String.replace`
  *      here and exactly `REPLACE` in DuckDB, so both engines execute
  *      the same pass structure by construction. Note the
  *      shared-delimiter consequence both inherit: adjacent symbol
  *      pairs share their separating space, so two BACK-TO-BACK pairs
  *      cannot both merge in one pass (`a b a b` → `ab a b`, not
  *      `ab ab`; with a gap, `a b x a b` → `ab x ab`) — BpeSpec's
  *      independent list reference pins exactly this. (Classic Sennrich
  *      BPE re-scans for the best pair after every merge; rank-ordered
  *      single passes are the deterministic variant whose replay is a
  *      REPLACE chain instead of an un-SQL-able loop — the semantics
  *      this engine DEFINES and both sides follow.)
  *   4. encoded words re-join with single spaces; every word's final
  *      symbol carries the `</w>` marker, so word boundaries survive.
  */
object BpeCodec {

  /** Symbolize one word by CODE POINT (matching DuckDB's per-character
    * slicing — UTF-16 code-unit iteration would split astral chars
    * differently) and run the padded merge rules.
    */
  def encodeWord(w: String, pats: Array[String], reps: Array[String]): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 8)
    sb.append(' ')
    var k = 0
    while (k < w.length) {
      val cp = w.codePointAt(k)
      sb.appendCodePoint(cp).append(' ')
      k += Character.charCount(cp)
    }
    sb.append("</w> ")
    var out = sb.toString
    var r = 0
    while (r < pats.length) { out = out.replace(pats(r), reps(r)); r += 1 }
    out.trim
  }

  /** Whole-document encode: split on single spaces, drop empties, encode
    * each word, join with single spaces. Empty/space-only text → "".
    */
  def encodeDoc(text: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    val parts = text.toString.split(" ")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        if (sb.length > 0) sb.append(' ')
        sb.append(encodeWord(parts(i), pats, reps))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** BYTE-LEVEL encode: the document's UTF-8 BYTES symbolize as
    * lowercase hex pairs over ONE delimited string — no word split, no
    * `</w>` marker, no delimiter dependence at all (space is just byte
    * `20`, an ordinary mergeable symbol), then the same rank-ordered
    * replace passes as [[encodeDoc]]. This is the modern-tokenizer
    * shape (GPT-2-style byte-level BPE): no OOV ever (any byte
    * symbolizes), multilingual for free (CJK text byte-symbolizes like
    * any other), and merges may cross word boundaries (` the ` can be
    * one token). Replayable in DuckDB as
    * `REGEXP_REPLACE(LOWER(HEX(ENCODE(t))), '(..)', '\1 ', 'g')`
    * wrapped in the REPLACE chain generated from the same merges
    * constant ([[graft.operators.Bpe.oracleByteEncodeSql]]).
    * Empty text → "".
    */
  def encodeByteDoc(text: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    val bytes = text.getBytes
    if (bytes.length == 0) return UTF8String.fromString("")
    val sb = new java.lang.StringBuilder(bytes.length * 3 + 2)
    sb.append(' ')
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HexDigits(b >> 4)).append(HexDigits(b & 15)).append(' ')
      i += 1
    }
    var out = sb.toString
    var r = 0
    while (r < pats.length) { out = out.replace(pats(r), reps(r)); r += 1 }
    UTF8String.fromString(out.trim)
  }
}

/** Codegen'd BPE encode with the merges table shipped as a literal
  * reference object (one `String[]` pair per task, never per row).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "empty merges table")
  merges.foreach { case (p, r) =>
    require(p.count(_ == ' ') == 1 && !p.startsWith(" ") && !p.endsWith(" "),
      s"merge pattern must be two space-separated symbols: '$p'")
    require(r.nonEmpty && !r.contains(' '), s"merge output must be one symbol: '$r'")
    require(p.replace(" ", "") == r,
      s"merge must concatenate its pair (no characters invented/lost): '$p' -> '$r'")
  }

  // rules pre-padded to their delimited form ONCE at plan time
  @transient private lazy val pats: Array[String] =
    merges.map(m => " " + m._1 + " ").toArray
  @transient private lazy val reps: Array[String] =
    merges.map(m => " " + m._2 + " ").toArray

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a STRING child, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encodeDoc(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.encodeDoc($c, $patsRef, $repsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), merges))
}

/** Codegen'd BYTE-LEVEL BPE encode (see [[BpeCodec.encodeByteDoc]]) —
  * same plan-time merge validation and literal-reference shipping as
  * [[BpeEncodeExpr]]; symbols are lowercase hex pairs of the UTF-8
  * bytes, so the validator additionally pins the alphabet.
  */
case class BpeByteEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.nonEmpty, "empty merges table")
  merges.foreach { case (p, r) =>
    require(p.count(_ == ' ') == 1 && !p.startsWith(" ") && !p.endsWith(" "),
      s"merge pattern must be two space-separated symbols: '$p'")
    require(r.nonEmpty && !r.contains(' '), s"merge output must be one symbol: '$r'")
    require(p.replace(" ", "") == r,
      s"merge must concatenate its pair (no characters invented/lost): '$p' -> '$r'")
    require(r.length % 2 == 0 && r.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"byte-level symbols are lowercase hex-pair sequences: '$r'")
  }

  @transient private lazy val pats: Array[String] =
    merges.map(m => " " + m._1 + " ").toArray
  @transient private lazy val reps: Array[String] =
    merges.map(m => " " + m._2 + " ").toArray

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_byte_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_byte_encode requires a STRING child, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeCodec.encodeByteDoc(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpeBytePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeByteReps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCodec.encodeByteDoc($c, $patsRef, $repsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeByteEncodeExpr =
    copy(child = newChild)
}

object BpeByteEncodeExpr {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeByteEncodeExpr(Bridge.expression(text), merges))
}
