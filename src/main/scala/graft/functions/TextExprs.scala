package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling hash
  * (Rabin-Karp): h₀ = seed; hᵢ = (hᵢ₋₁·base + cᵢ) mod m over the
  * string's Unicode code points.
  *
  * The higher-order-function route (`aggregate(transform(split(...)))`)
  * is interpreted (CodegenFallback) and allocates one array element per
  * character; this expression generates a tight primitive loop inside
  * whole-stage codegen. Semantics match the HOF formulation for all BMP
  * text (astral chars: this folds true code points, where split-on-empty
  * folds UTF-16 code units — the code-point fold is also what the DuckDB
  * oracle's per-character UNICODE() computes).
  */
case class RollingHash(child: Expression, seed: Long, base: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 0 && base > 0, s"base/mod must be positive: base=$base mod=$mod")
  // (mod-1)*base + max-codepoint must not overflow a signed 64-bit long
  require(mod - 1 <= (Long.MaxValue - 0x10FFFF) / base,
    s"(mod-1)*base + maxCodePoint would overflow Long: base=$base mod=$mod")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // reduce the seed first: a raw seed >= mod would overflow h*base on
    // the first character (floorMod also normalizes negative seeds)
    var h = java.lang.Math.floorMod(seed, mod)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $c.toString();
         |long $h = java.lang.Math.floorMod(${seed}L, ${mod}L);
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * ${base}L + $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(c: Column, seed: Long = 7L, base: Long = 31L,
            mod: Long = 1000000007L): Column =
    Bridge.column(RollingHash(Bridge.expression(c), seed, base, mod))
}

/** Content-defined chunking boundaries (basic Rabin CDC): the windowed
  * polynomial hash h(i) = Σ_{j<w} c_{i-j}·base^j mod m is computed over a
  * sliding `window` of code points, and position i (1-based window END)
  * is a boundary when h(i) % div == 0. Chunk edges follow CONTENT, so an
  * insertion early in a document only reshuffles boundaries locally —
  * the primitive behind byte/char-level dedup of near-identical blobs at
  * scale (rsync/LBFS lineage; FastCDC adds min/max clamps on top).
  *
  * This expression maintains the hash incrementally (subtract the
  * outgoing code point's base^(w-1) term, shift, add the incoming one):
  * O(n) per document inside whole-stage codegen. The DuckDB oracle
  * recomputes every window's fold from scratch (O(n·w)) — agreeing
  * results check the rolling update's modular arithmetic, not just the
  * plumbing.
  */
case class CdcBoundaries(child: Expression, window: Int, base: Long,
                         mod: Long, div: Long)
    extends UnaryExpression {

  require(window > 0, s"window must be positive: $window")
  require(div > 0, s"div must be positive: $div")
  require(mod > 0 && base > 0, s"base/mod must be positive: base=$base mod=$mod")
  require(mod - 1 <= (Long.MaxValue - 0x10FFFF) / base,
    s"(mod-1)*base + maxCodePoint would overflow Long: base=$base mod=$mod")
  // cOut * base^(w-1) mod m is computed as (cOut * bw) with bw < mod:
  // max code point (0x10FFFF) * (mod-1) must fit in a Long
  require(mod - 1 <= Long.MaxValue / 0x10FFFF,
    s"maxCodePoint * (mod-1) would overflow Long: mod=$mod")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries requires a string input, got ${child.dataType.sql}")

  /** base^(window-1) mod m, precomputed once. */
  private lazy val bw: Long = {
    var r = 1L
    var i = 0
    while (i < window - 1) { r = (r * base) % mod; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < cps.length) {
      h = (h * base + cps(i)) % mod
      if (i >= window) {
        // fully-formed windows only: drop the code point that left
        h = java.lang.Math.floorMod(h - (cps(i - window) * bw % mod) * base % mod, mod)
      }
      if (i >= window - 1 && h % div == 0) out += i + 1 // 1-based window end
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // primitive growable buffer, not ArrayList<Integer>: Janino ignores
      // generics (get() returns Object) and does not auto-unbox, so the
      // boxed version fails to compile and silently de-codegens the
      // whole projection (round-6 finding; was an interpreted fallback)
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |int[] $out = new int[16];
         |int $cnt = 0;
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${base}L + $cps[$i]) % ${mod}L;
         |  if ($i >= $window) {
         |    $h = java.lang.Math.floorMod(
         |      $h - ($cps[$i - $window] * ${bw}L % ${mod}L) * ${base}L % ${mod}L, ${mod}L);
         |  }
         |  if ($i >= ${window - 1} && $h % ${div}L == 0L) {
         |    if ($cnt == $out.length) $out = java.util.Arrays.copyOf($out, $cnt * 2);
         |    $out[$cnt++] = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  def apply(c: Column, window: Int = 8, base: Long = 31L,
            mod: Long = 1000000007L, div: Long = 64L): Column =
    Bridge.column(CdcBoundaries(Bridge.expression(c), window, base, mod, div))
}

/** Winnowing fingerprint positions (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): over the per-position k-gram
  * rolling hashes (the same windowed polynomial as [[CdcBoundaries]]),
  * select in every window of `w` CONSECUTIVE k-gram hashes the
  * RIGHTMOST minimal one, and emit the distinct selected positions
  * (1-based code-point start of each selected k-gram).
  *
  * The published guarantee this tier is built on: any substring match
  * of length >= t = w + k - 1 shares at least one selected fingerprint
  * in BOTH copies — a window of w k-gram hashes lies fully inside each
  * copy of the match (a length-s match holds s - k + 1 >= w k-grams),
  * its hash multiset is identical in both, and the rightmost-min rule
  * is a pure function of that multiset, so the same relative position
  * is selected on both sides. That makes winnowed anchors a LOSSLESS
  * candidate filter for exact-substring dedup at threshold L >= t
  * (SubstrDedup's pass A), at ~n/w shuffled rows per document instead
  * of n.
  *
  * Implementation is the O(n) monotonic-deque sliding-window minimum
  * (popping `>=` from the back keeps the rightmost among equal minima)
  * inside whole-stage codegen; consecutive windows re-selecting the
  * same position emit it once. Documents shorter than w + k - 1 code
  * points have no full window and yield an empty array — correct, as
  * they cannot contain a length-t match.
  */
case class WinnowAnchors(child: Expression, k: Int, w: Int,
                         base: Long, mod: Long)
    extends UnaryExpression {

  require(k > 0, s"k-gram length must be positive: $k")
  require(w > 0, s"winnow window must be positive: $w")
  require(mod > 0 && base > 0, s"base/mod must be positive: base=$base mod=$mod")
  require(mod - 1 <= (Long.MaxValue - 0x10FFFF) / base,
    s"(mod-1)*base + maxCodePoint would overflow Long: base=$base mod=$mod")
  require(mod - 1 <= Long.MaxValue / 0x10FFFF,
    s"maxCodePoint * (mod-1) would overflow Long: mod=$mod")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_anchors requires a string input, got ${child.dataType.sql}")

  /** base^(k-1) mod m, for the outgoing code point's term. */
  private lazy val bk: Long = {
    var r = 1L
    var i = 0
    while (i < k - 1) { r = (r * base) % mod; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val nGrams = n - k + 1
    if (nGrams < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Int])
    // per-k-gram hashes, indexed by 0-based k-gram start
    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * base + cps(i)) % mod
      if (i >= k) {
        h = java.lang.Math.floorMod(h - (cps(i - k) * bk % mod) * base % mod, mod)
      }
      if (i >= k - 1) hs(i - k + 1) = h
      i += 1
    }
    // monotonic deque of k-gram indices; >= pop keeps the rightmost min
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var last = -1
    var j = 0
    while (j < nGrams) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1 && dq(head) != last) {
        last = dq(head)
        out += last + 1 // 1-based code-point start position
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val nGrams = ctx.freshName("nGrams")
      val hs = ctx.freshName("hs")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val dq = ctx.freshName("dq")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val last = ctx.freshName("last")
      val j = ctx.freshName("j")
      // primitive arrays throughout (the CdcBoundaries Janino lesson:
      // boxed collections de-codegen the projection)
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |int $nGrams = $n - ${k} + 1;
         |int[] $out;
         |int $cnt = 0;
         |if ($nGrams < $w) {
         |  $out = new int[0];
         |} else {
         |  long[] $hs = new long[$nGrams];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $h = ($h * ${base}L + $cps[$i]) % ${mod}L;
         |    if ($i >= $k) {
         |      $h = java.lang.Math.floorMod(
         |        $h - ($cps[$i - $k] * ${bk}L % ${mod}L) * ${base}L % ${mod}L, ${mod}L);
         |    }
         |    if ($i >= ${k - 1}) $hs[$i - ${k} + 1] = $h;
         |  }
         |  int[] $dq = new int[$nGrams];
         |  int $head = 0; int $tail = 0;
         |  $out = new int[$nGrams / $w + 2];
         |  int $last = -1;
         |  for (int $j = 0; $j < $nGrams; $j++) {
         |    while ($tail > $head && $hs[$dq[$tail - 1]] >= $hs[$j]) $tail--;
         |    $dq[$tail++] = $j;
         |    if ($dq[$head] <= $j - $w) $head++;
         |    if ($j >= ${w - 1} && $dq[$head] != $last) {
         |      $last = $dq[$head];
         |      if ($cnt == $out.length) $out = java.util.Arrays.copyOf($out, $cnt * 2);
         |      $out[$cnt++] = $last + 1;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

object WinnowAnchors {
  def apply(c: Column, k: Int, w: Int, base: Long = 31L,
            mod: Long = 1000000007L): Column =
    Bridge.column(WinnowAnchors(Bridge.expression(c), k, w, base, mod))
}

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * curation step that makes text dedup robust to ENCODING variance:
  * the same logical text arrives from different crawls as composed
  * (U+00E9) or decomposed (U+0065 U+0301) sequences, byte-distinct to
  * every hash-keyed tier (exact, chunk, substring) while rendering
  * identically. Normalizing before key derivation collapses them.
  *
  * NFC, deliberately not NFKC: canonical equivalence preserves the
  * text's meaning exactly (ﬁ-ligature vs "fi" and ² vs "2" stay
  * DISTINCT — compatibility folding is lossy and belongs to a separate
  * policy decision), and NFC is what the oracle engine exposes
  * (`nfc_normalize`). Cross-engine exactness rests on the Unicode
  * normalization STABILITY policy: normalization of assigned code
  * points never changes between versions, so the JDK and utf8proc
  * agree bit-for-bit (fixture pins composition, Hangul syllable
  * composition, singleton mapping, and the composition-exclusion
  * class).
  *
  * Spark has no builtin for this; `java.text.Normalizer` is the
  * platform implementation, called directly from whole-stage codegen
  * (it fast-paths already-normalized text, the overwhelming majority
  * of real corpora). Per-row scalar — no shuffle at any scale; run it
  * BEFORE any hash-keyed stage.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
