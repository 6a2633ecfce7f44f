package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row token statistics for the repetition-quality signals:
  * `struct(n_tokens, n_distinct, top_count, n_grams, n_distinct_grams)`
  * over whitespace tokens (empties dropped) and adjacent 2-grams.
  *
  * The Column-composed form needs `transform(array_distinct(ws),
  * d -> size(filter(ws, _ == d)))` — O(distinct × tokens) interpreted
  * lambda evaluations per document — plus two more distinct passes for
  * the 2-grams. This expression is a single O(tokens) hash-count pass.
  * Values are integers with identical semantics, so the DuckDB oracle is
  * unchanged (TokenStatsSpec asserts equality with the HOF form).
  */
object TokenStatsOps {
  // hoisted: String.split(regex) compiles the Pattern per CALL, a per-row
  // cost in an expression whose whole point is avoiding per-row regex
  // work. The class is Ws's (RE2-compatible — no \v), not Java's \s.
  private val WsRun =
    java.util.regex.Pattern.compile(s"[${Ws.ClassBody}]+")
  def eval(s: UTF8String): InternalRow = {
    val toks = new java.util.ArrayList[String](64)
    val it = WsRun.split(s.toString, -1) // the Ws tokenizer contract
    var i = 0
    while (i < it.length) {
      if (it(i).nonEmpty) toks.add(it(i))
      i += 1
    }
    val n = toks.size
    val counts = new java.util.HashMap[String, Int](n * 2)
    var top = 0
    i = 0
    while (i < n) {
      val c = counts.merge(toks.get(i), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    var nGrams = 0
    val gramSet = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n - 1) {
      gramSet.add(toks.get(i) + " " + toks.get(i + 1))
      nGrams += 1
      i += 1
    }
    InternalRow(n.toLong, counts.size.toLong, top.toLong,
      nGrams.toLong, gramSet.size.toLong)
  }
}

/** One-pass token/punctuation counters for t03:
  * `struct(n_ws_tokens, n_bpe_tokens, n_punct)` from a single code-point
  * scan, no allocation.
  *
  * The Column-composed form materializes every BPE-ish regex match into
  * an array (`regexp_extract_all`) and a punctuation-stripped copy of the
  * document (`regexp_replace`) just to take their lengths — per-row
  * garbage proportional to document size, measured 6× the DuckDB oracle
  * at sf0.1. The counts are pure run/char arithmetic:
  *  - whitespace tokens = maximal non-whitespace runs (the [[Ws]]
  *    contract, = `\s+`-split semantics);
  *  - `[a-z]+|[0-9]+|[^a-z0-9\s]` matches = letter-run starts + digit-run
  *    starts + every other non-whitespace code point (regex alternation
  *    scans left-to-right, so each run is one match and each residual
  *    char its own match);
  *  - punct = code points outside `[a-z0-9\s]` (`regexp_replace` +
  *    `length` counts code points, as does DuckDB's `length`).
  * TokenStatsSpec holds this equal to the regex form.
  */
object TokenCountsOps {
  def eval(s: UTF8String): InternalRow = {
    // one scan over the raw UTF-8 BYTES (the SimhashOps discipline — the
    // previous toString paid a full UTF-16 copy of every document per
    // row, the dominant allocation of a corpus-wide t03 scan): every
    // class the counters test for is ASCII (letter runs, digit runs, the
    // Ws separators), so a non-ASCII code point is always class "other"
    // — its LEAD byte counts it once and its continuation bytes are
    // skipped, which is exactly codePointAt iteration without the decode.
    // INVALID UTF-8 keeps the replacement-char semantics of the old
    // codepoint scan (each stray/invalid byte decodes to one U+FFFD = one
    // "other"): a continuation byte is "same code point" ONLY while a
    // lead byte still expects one, so a stray continuation, an invalid
    // or overlong lead (0xC0/0xC1, 0xF5+), or excess continuations past
    // the lead's declared length each count as their own "other".
    // Pinned residual: a structurally-valid-SHAPED but semantically
    // invalid sequence (a surrogate like ED A0 80, an out-of-range F4 9x)
    // counts as ONE "other" where Java's decoder yields one U+FFFD per
    // malformed subpart — matching that exactly needs per-lead
    // second-byte range tables for input that is already garbage; the
    // divergence is bounded by the sequence's byte length (≤ 3 per
    // occurrence) and valid UTF-8 is exact.
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var ws = 0
    var bpe = 0
    var punct = 0
    var prev = 3 // 0 = letter, 1 = digit, 2 = other, 3 = space
    var expect = 0 // continuation bytes still owed to the current lead
    while (i < n) {
      val b = bytes(i)
      i += 1
      val cls =
        if (b >= 'a' && b <= 'z') 0
        else if (b >= '0' && b <= '9') 1
        else if (Ws.is(b)) 3
        else if ((b & 0xC0) == 0x80) {
          if (expect > 0) { expect -= 1; 4 } else 2
        } else 2
      if (cls != 4) {
        // overlong (C0/C1) and beyond-U+10FFFF (F5..F7) leads are
        // rejected per byte by Java's decoder — expect no continuations
        expect =
          if ((b & 0xE0) == 0xC0) { if ((b & 0xFF) >= 0xC2) 1 else 0 }
          else if ((b & 0xF0) == 0xE0) 2
          else if ((b & 0xF8) == 0xF0) { if ((b & 0xFF) <= 0xF4) 3 else 0 }
          else 0
        if (cls != 3 && prev == 3) ws += 1
        if (cls == 2) { bpe += 1; punct += 1 }
        else if (cls != 3 && cls != prev) bpe += 1
        prev = cls
      }
    }
    InternalRow(ws, bpe, punct)
  }
}

case class TokenCounts(child: Expression) extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", IntegerType, nullable = false),
    StructField("n_bpe_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCountsOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCountsOps.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenStats(child: Expression) extends UnaryExpression {
  // fail at ANALYSIS on a non-string child, never as a per-task
  // ClassCastException mid-job (the WordNgrams rule)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    TokenStatsOps.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenStatsOps.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
