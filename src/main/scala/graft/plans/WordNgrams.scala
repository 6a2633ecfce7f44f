package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass word n-gram shingling.
  *
  * The Column-composed form (`transform(sequence(1, size(ws)-n+1),
  * i => array_join(slice(ws, i, n), " "))` over `filter(split(text))`)
  * evaluates the split THREE times per row (size guard, sequence bound,
  * lambda body) and pays interpreted higher-order-function overhead per
  * position — ~10× slower than the single-node DuckDB mirror on the same
  * corpus. This expression tokenizes once and emits every n-gram in one
  * tight loop. Values are identical to the HOF form (WordNgramsSpec
  * asserts equality), so the DuckDB oracles are unchanged — swapping it
  * in is a pure plan optimization, the same move round 2 made for
  * character-shingle minhash ([[ShingleOps]]).
  */
/** THE tokenizer whitespace class, shared by every native expression and
  * matched exactly by `TextFns.words`' regex split and the oracle SQL's
  * `regexp_split_to_array(text, '\s+')`: space, \t, \n, \f, \r — RE2's
  * `\s` class, which the DuckDB oracle evaluates. Deliberately NOT
  * Java's `\s`: Java includes vertical tab (0x0B), RE2 does not, so the
  * Spark side spells the class explicitly everywhere instead of writing
  * `\s` and silently forking from the oracle on a \v byte (which both
  * engines must treat as a token character). One definition so the
  * tokenizations can never fork — real corpora are newline-formatted,
  * and a single-space split silently merges line-straddling words into
  * pseudo-tokens that break stopword matching, quality ratios, and
  * fingerprints.
  */
object Ws {
  /** The class as a Java-regex character-class body, for `split`s. */
  val ClassBody = " \\t\\n\\f\\r"
  def is(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'
  def is(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
}

object WordNgramOps {

  /** Space-joined word n-grams of `s` (split on whitespace runs — the
    * [[Ws]] / [[graft.functions.TextFns.words]] contract; empty tokens
    * dropped). Fewer than n tokens → empty array. `distinct` keeps the
    * first occurrence of each gram (order is set-semantic for every
    * consumer; first-occurrence is deterministic).
    */
  def wordNgrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    // token boundaries on the raw UTF-8 bytes: every Ws byte is
    // single-byte ASCII and never part of a multi-byte sequence, so
    // byte-splitting == char-splitting
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nw = 0
    var i = 0
    while (i < bytes.length) {
      if (!Ws.is(bytes(i))) {
        val st = i
        while (i < bytes.length && !Ws.is(bytes(i))) i += 1
        if (nw == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nw * 2)
          ends = java.util.Arrays.copyOf(ends, nw * 2)
        }
        starts(nw) = st; ends(nw) = i; nw += 1
      } else i += 1
    }
    if (nw < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nw - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String](64) else null
    var k = 0
    var g = 0
    while (g <= nw - n) {
      // one copy per gram: tokens may be separated by RUNS of arbitrary
      // whitespace in the source, so rebuild the gram with exactly one
      // space between tokens (the canonical join both engines emit)
      var len = n - 1
      var t = g
      while (t < g + n) { len += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      t = g
      while (t < g + n) {
        if (t > g) { buf(pos) = ' '; pos += 1 }
        val w = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, w)
        pos += w
        t += 1
      }
      val gram = UTF8String.fromBytes(buf)
      if (seen == null || seen.add(gram)) { out(k) = gram; k += 1 }
      g += 1
    }
    new GenericArrayData(if (k == out.length) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }
}

object WsTokenOps {
  /** The tokens of `s` (maximal runs of non-[[Ws]] bytes, in order, with
    * multiplicity) — the native form of `TextFns.words`' HOF composition
    * `filter(split(text, "[Ws]+"), w => length(w) > 0)`. The composition
    * is the text family's hottest per-row path and pays dearly per call:
    * Spark's `StringSplit` routes through `UTF8String.split`, which
    * compiles the regex and materializes a full java.lang.String PER ROW,
    * then re-wraps every token; the filter adds an interpreted lambda per
    * element. This is one byte scan with zero-regex, zero-String token
    * slicing. Every [[Ws]] byte is single-byte ASCII and never part of a
    * multi-byte UTF-8 sequence, so byte-splitting == char-splitting
    * (WordNgramOps' rule). Values and element order identical to the HOF
    * form (WsTokensSpec asserts equality, whitespace-only and multibyte
    * cases included).
    */
  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var out = new Array[AnyRef](16)
    var nw = 0
    var i = 0
    while (i < bytes.length) {
      if (!Ws.is(bytes(i))) {
        val st = i
        while (i < bytes.length && !Ws.is(bytes(i))) i += 1
        if (nw == out.length) out = java.util.Arrays.copyOf(out, nw * 2)
        out(nw) = UTF8String.fromBytes(bytes, st, i - st)
        nw += 1
      } else i += 1
    }
    new GenericArrayData(
      if (nw == out.length) out else java.util.Arrays.copyOf(out, nw))
  }
}

/** text → array<string> of whitespace-separated tokens (empties dropped) —
  * the native `TextFns.words`. Empty array for an all-whitespace or empty
  * text; null only on null input.
  */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires a STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WsTokenOps.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WsTokenOps.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<string> of space-joined word n-grams (optionally distinct,
  * first-occurrence order). Empty array when the text has fewer than n
  * tokens — never null beyond a null input, so default nullability holds.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n > 0)
  // a non-string child must fail at ANALYSIS, not as a per-task
  // ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNgramOps.wordNgrams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordNgramOps.wordNgrams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
