package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL registration for the engine's custom Catalyst functions, so the
  * spark.sql surface is at parity with the Column API:
  *
  *   SELECT array_dot(a, b), minhash_sketch(sh, 64) ...
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("array_dot",
      exprs => {
        require(exprs.length == 2, "array_dot(a, b) takes exactly 2 array arguments")
        // ArrayDot reads 8-byte doubles from the array data; cast so
        // array<int>/array<float> inputs are promoted, not misread.
        ArrayDot(
          Cast(exprs(0), ArrayType(DoubleType)),
          Cast(exprs(1), ArrayType(DoubleType)))
      }, "built-in")
    registry.createOrReplaceTempFunction("rolling_hash",
      exprs => {
        require(exprs.nonEmpty && exprs.length <= 4,
          "rolling_hash(text[, seed[, base[, mod]]]) takes 1-4 arguments")
        def longLit(i: Int, default: Long): Long =
          if (exprs.length <= i) default
          else exprs(i) match {
            case Literal(v: Number, _) => v.longValue()
            case other => throw new IllegalArgumentException(
              s"rolling_hash argument ${i + 1} must be an integer literal, got: ${other.sql}")
          }
        RollingHash(exprs(0), longLit(1, 7L), longLit(2, 31L), longLit(3, 1000000007L))
      }, "built-in")
    registry.createOrReplaceTempFunction("cdc_boundaries",
      exprs => {
        require(exprs.nonEmpty && exprs.length <= 5,
          "cdc_boundaries(text[, window[, base[, mod[, div]]]]) takes 1-5 arguments")
        def longLit(i: Int, default: Long): Long =
          if (exprs.length <= i) default
          else exprs(i) match {
            case Literal(v: Number, _) => v.longValue()
            case other => throw new IllegalArgumentException(
              s"cdc_boundaries argument ${i + 1} must be an integer literal, got: ${other.sql}")
          }
        CdcBoundaries(exprs(0), longLit(1, 8L).toInt, longLit(2, 31L),
          longLit(3, 1000000007L), longLit(4, 64L))
      }, "built-in")
    registry.createOrReplaceTempFunction("minhash_sketch",
      exprs => {
        require(exprs.length == 2,
          "minhash_sketch(col, numHashes) takes exactly 2 arguments")
        val n = exprs(1) match {
          case Literal(v: Number, _) if v.intValue() > 0 => v.intValue()
          case other => throw new IllegalArgumentException(
            s"minhash_sketch numHashes must be a positive integer literal, got: ${other.sql}")
        }
        MinHashSketch(exprs(0), n)
      }, "built-in")
    registry.createOrReplaceTempFunction("bitmap_distinct",
      exprs => {
        require(exprs.length == 1, "bitmap_distinct(idCol) takes exactly 1 argument")
        BitmapDistinct(exprs(0)).toAggregateExpression()
      }, "built-in")
    registry.createOrReplaceTempFunction("unicode_tokens",
      exprs => {
        require(exprs.length == 1, "unicode_tokens(text) takes exactly 1 argument")
        UniTokenize(exprs(0))
      }, "built-in")
    registry.createOrReplaceTempFunction("bpe_encode",
      exprs => {
        // the frozen-deployment merges table (operators/Bpe.StandardMerges)
        // ships as the expression's literal reference, same as the Column API
        require(exprs.length == 1, "bpe_encode(text) takes exactly 1 argument")
        BpeEncodeExpr(exprs(0), graft.operators.Bpe.StandardMerges)
      }, "built-in")
    registry.createOrReplaceTempFunction("bpe_byte_encode",
      exprs => {
        require(exprs.length == 1, "bpe_byte_encode(text) takes exactly 1 argument")
        BpeByteEncodeExpr(exprs(0), graft.operators.Bpe.ByteMerges)
      }, "built-in")
    registry.createOrReplaceTempFunction("milli_log2",
      exprs => {
        // Fixed-point integer log2 in MILLI-bits for x >= 1:
        //   (bitlen(x)-1)*1000 + ((x*1000) >> (bitlen(x)-1)) - 1000
        // — floor(log2) from the bit length plus a linear-interpolation
        // fraction from one shift. Deterministic across engines (pure
        // integer ops; DuckDB replays it with LENGTH(PRINTF('%b',x))),
        // monotone in x, certified error band [0, 87.2] milli-bits vs
        // true log2 (Bm25Spec) — the conformance-safe log the BM25 idf
        // (operators/Bm25, q173) is built on, exposed to the SQL
        // surface as a composition of BUILT-IN codegen'd expressions
        // (no new evaluation code to trust).
        require(exprs.length == 1, "milli_log2(x) takes exactly 1 argument (integer >= 1)")
        import org.apache.spark.sql.catalyst.expressions.{Add, Bin, GreaterThan, If, Length, LessThan, Multiply, Or, ShiftRight, Subtract}
        import org.apache.spark.sql.types.LongType
        val x = Cast(exprs(0), LongType)
        val blm1 = Subtract(Length(Bin(x)), Literal(1))
        val formula = Subtract(
          Add(
            Multiply(Cast(blm1, LongType), Literal(1000L)),
            ShiftRight(Multiply(x, Literal(1000L)), blm1)),
          Literal(1000L))
        // enforce the documented domain instead of returning silent
        // garbage: x < 1 hits bin()'s 64-char two's-complement form
        // (negative) or returns -1000 (zero), and x > Long.MaxValue/1000
        // overflows the x*1000 interpolation term. Out-of-domain -> NULL
        // (the SQL convention for partial functions), so a bad row
        // surfaces as a null score, never as a plausible wrong number.
        If(Or(LessThan(x, Literal(1L)),
              GreaterThan(x, Literal(Long.MaxValue / 1000))),
          Literal(null, LongType), formula)
      }, "built-in")
    // HTML extraction to the SQL surface. Built at the CATALYST level
    // (a Bridge round-trip of the Column chain leaves unresolved
    // ColumnNode wrappers the function registry can't evaluate) but
    // from the SAME TextFns pattern/entity constants as the Column API;
    // SqlSurfaceSpec pins SQL == Column on a doc exercising blocks,
    // entities, and anchors, so a drifted chain fails loudly.
    import org.apache.spark.sql.catalyst.expressions.Expression
    def htmlBlocksRemoved(e: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.RegExpReplace
      Seq(TextFns.HtmlCommentPattern, TextFns.HtmlScriptPattern,
        TextFns.HtmlStylePattern).foldLeft(e) { (acc, p) =>
        RegExpReplace(acc, Literal(p), Literal(" "))
      }
    }
    def htmlTextExpr(e: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringTrim}
      val noTags = RegExpReplace(htmlBlocksRemoved(e),
        Literal(TextFns.HtmlTagPattern), Literal(" "))
      val decoded = TextFns.HtmlEntities.foldLeft(noTags) { case (acc, (ent, rep)) =>
        RegExpReplace(acc, Literal(ent), Literal(rep))
      }
      StringTrim(RegExpReplace(decoded, Literal(TextFns.HtmlSpacePattern), Literal(" ")))
    }
    registry.createOrReplaceTempFunction("html_text",
      exprs => {
        require(exprs.length == 1, "html_text(html) takes exactly 1 argument")
        htmlTextExpr(exprs(0))
      }, "built-in")
    registry.createOrReplaceTempFunction("html_link_count",
      exprs => {
        require(exprs.length == 1, "html_link_count(html) takes exactly 1 argument")
        import org.apache.spark.sql.catalyst.expressions.{RegExpExtractAll, Size}
        Cast(Size(RegExpExtractAll(htmlBlocksRemoved(exprs(0)),
          Literal(TextFns.HtmlAnchorPattern), Literal(1))),
          org.apache.spark.sql.types.LongType)
      }, "built-in")

    // pii_redact(text): the full PII scrub chain (the five regex stages
    // in PiiFns.Stages order, then the Luhn card stage) as a SQL-surface
    // scalar. Parses PiiFns.redactSqlText — generated from the same
    // Stages seq and constants as the Column API — and splices the
    // argument in for the placeholder attribute. (Bridge-wrapping the
    // Column directly does NOT work here: the wrapped node is opaque to
    // the analyzer inside a registry builder and dies at codegen.)
    // SqlSurfaceSpec pins SQL == Column over the ENTIRE PII fixture.
    // nfc_normalize(text): Unicode NFC (UAX #15) — the same Catalyst
    // expression the q206/q207 rows run; name-compatible with the
    // oracle engine's builtin so SQL written against either works.
    registry.createOrReplaceTempFunction("nfc_normalize",
      exprs => {
        require(exprs.length == 1, "nfc_normalize(text) takes exactly 1 argument")
        NfcNormalize(exprs(0))
      }, "built-in")

    registry.createOrReplaceTempFunction("pii_redact",
      exprs => {
        require(exprs.length == 1, "pii_redact(text) takes exactly 1 argument")
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(PiiFns.redactSqlText("__pii_redact_in"))
          .transformUp {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                if a.name == "__pii_redact_in" => exprs(0)
          }
      }, "built-in")

    // url_canonical(url): the UrlFns canonical form (scheme/host
    // lowercase, default-port drop, fragment drop, tracking-param
    // strip, dangling-? tidy, verbatim pass-through for non-URLs) from
    // the SAME pattern constants; SqlSurfaceSpec pins SQL == Column.
    registry.createOrReplaceTempFunction("url_canonical",
      exprs => {
        require(exprs.length == 1, "url_canonical(url) takes exactly 1 argument")
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Concat,
          EqualTo, Expression, Lower, RLike, RegExpExtract, RegExpReplace}
        val url = exprs(0)
        def rep(e: Expression, p: String, r: String): Expression =
          RegExpReplace(e, Literal(p), Literal(r))
        val scheme = Lower(RegExpExtract(url, Literal(UrlFns.SchemePattern), Literal(1)))
        val auth = RegExpExtract(url, Literal(UrlFns.HostPattern), Literal(1))
        val userinfo = RegExpExtract(auth, Literal(UrlFns.UserinfoPattern), Literal(1))
        val hostPort = Lower(rep(auth, UrlFns.UserinfoStripPattern, ""))
        val host = CaseWhen(Seq(
          (EqualTo(scheme, Literal("http")), rep(hostPort, ":80$", "")),
          (EqualTo(scheme, Literal("https")), rep(hostPort, ":443$", ""))),
          Some(hostPort))
        val authority = CaseWhen(Seq((RLike(auth, Literal(UrlFns.UserinfoPattern)),
          Concat(Seq(userinfo, Literal("@"), host)))), Some(host))
        val tidy = rep(rep(rep(rep(rep(url, UrlFns.PrefixPattern, ""),
          UrlFns.FragmentPattern, ""), UrlFns.AmpTrackingPattern, ""),
          UrlFns.LeadTrackingPattern, "?"), UrlFns.TrailingQueryPattern, "")
        CaseWhen(Seq((RLike(url, Literal(UrlFns.SchemePattern)),
          Concat(Seq(scheme, Literal("://"), authority, tidy)))), Some(url))
      }, "built-in")
  }
}
