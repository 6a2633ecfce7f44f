package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline operators
  * (dedup shingling, language ID, quality scoring, token counting,
  * fingerprinting). All pure `Column` composition — codegen-friendly, no
  * UDFs — and every definition has an exact DuckDB-SQL mirror for the
  * oracle.
  */
object TextFns {

  /** Whitespace tokens (maximal whitespace-run-separated tokens — the
    * [[graft.plans.Ws]] contract: RE2's `\s` class spelled explicitly,
    * because Java's `\s` also matches \v and would fork from the
    * oracle's `regexp_split_to_array(text, '\s+')`), empties dropped:
    * the split still yields a leading/trailing empty string when the
    * text starts/ends with whitespace in both engines, so filter them.
    * A literal single-space split here would silently merge
    * line-straddling words of any newline-formatted document (i.e. most
    * real corpora) into pseudo-tokens that defeat stopword matching,
    * quality ratios, and fingerprints.
    */
  def words(c: Column): Column =
    // native one-pass tokenizer ([[graft.plans.WsTokens]]): the HOF
    // composition `filter(split(c, "[Ws]+"), length > 0)` compiled the
    // regex and materialized a java.lang.String per ROW inside
    // UTF8String.split, plus an interpreted lambda per element — the
    // text family's hottest per-row path (round-21 profile: ~15–21 s of
    // task time on each of t05/t10/t16/t17/t21). Values, order and
    // element multiplicity identical (WsTokensSpec pins it against the
    // old composition, multibyte and whitespace-only cases included).
    org.apache.spark.sql.graft.Bridge.column(
      graft.plans.WsTokens(org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Word n-gram shingles (space-joined) at every token position; fewer
    * than n tokens → empty array. Reference HOF form — same `when` guard
    * as [[charShingles]]: `sequence(1, n)` with n ≤ 0 descends instead of
    * emptying. Production queries use [[wordNgramsNative]] (identical
    * values, one tokenize pass instead of three + no per-position lambda
    * overhead); WordNgramsSpec holds the two equal.
    */
  def wordNgramsBuiltin(ws: Column, n: Int): Column =
    when(ws.isNull, lit(null).cast("array<string>")) // align with native: null in → null out
      .when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Native one-pass word n-grams over the raw text column
    * ([[graft.plans.WordNgrams]]); `distinct` dedups to first occurrence
    * inside the row.
    */
  def wordNgramsNative(text: Column, n: Int, distinct: Boolean = false): Column = {
    import org.apache.spark.sql.graft.{Bridge => B}
    B.column(graft.plans.WordNgrams(B.expression(text), n, distinct))
  }

  /** Character k-gram shingles at every position (length < k → empty array).
    * The `when` guard matters: Spark's `sequence(1, n)` with n ≤ 0 produces
    * a DESCENDING sequence, not an empty one.
    */
  def charShingles(c: Column, k: Int): Column = charShingles(c, k, 1)

  /** Strided variant: windows at positions 1, 1+stride, … (stride = 1 is
    * every position — the shingle form; larger strides are d27's
    * fingerprint windows). The `when` guard is load-bearing for any
    * stride: `sequence` with an upper bound below the lower DESCENDS
    * instead of emptying.
    */
  def charShingles(c: Column, k: Int, stride: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1), lit(stride)),
        i => c.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
  import graft.plans.Md5PrefixLong

  /** A 60-bit integer hash from md5 — the deterministic, engine-portable
    * token hash used by simhash (DuckDB mirror:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT`). 15 hex chars keep the
    * value < 2^60, safely inside BIGINT for both engines. Evaluated by the
    * native [[graft.plans.Md5PrefixLong]] expression (digest bytes → long,
    * no hex-string round trip); value identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`.
    */
  def hash60(c: Column): Column =
    ExpressionUtils.column(Md5PrefixLong(ExpressionUtils.expression(c), 15))

  /** 28-bit md5-derived hash — small enough that an affine permutation
    * `(a*h + b) mod P` with a < 2^24, b < 2^30, P < 2^30 stays inside
    * exact BIGINT arithmetic in both engines (a*h ≈ 2^52 and the +b stays
    * < 2^53, well under 2^63 — note the bound is asymmetric: the
    * MinhashB offsets legitimately run up to ~2^27, it is only the
    * MULTIPLIER a that must stay < 2^24). Base hash for the minhash
    * permutation family.
    */
  def hash28(c: Column): Column =
    ExpressionUtils.column(Md5PrefixLong(ExpressionUtils.expression(c), 7))

  /** Small per-language stopword lists for the n-gram/language heuristic.
    * Deterministic and mirrored verbatim in the oracle SQL.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un"))

  /** Count of tokens (with multiplicity) that belong to `list`. */
  def stopwordHits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(list)))

  /** Language-ID by stopword-hit argmax with a fixed tie order
    * (de < en < es < fr); all-zero → "und". NULL text also lands in
    * "und": the hit counts are NULL there, and without the coalesce
    * every `when` condition would evaluate NULL and fall through to the
    * `otherwise` — confidently labeling a null document French. The
    * oracle mirrors the exact CASE chain (coalesce included), so parity
    * holds by construction.
    */
  def langId(text: Column): Column = {
    val ws = words(text)
    val s = Seq("de", "en", "es", "fr").map(l => l -> stopwordHits(ws, stopwords(l))).toMap
    when(coalesce(s("de") + s("en") + s("es") + s("fr"), lit(0)) === 0, lit("und"))
      .when(s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr"), lit("de"))
      .when(s("en") >= s("es") && s("en") >= s("fr"), lit("en"))
      .when(s("es") >= s("fr"), lit("es"))
      .otherwise(lit("fr"))
  }

  /** [[langId]] over a PRE-MATERIALIZED token-array column, staged
    * through projection boundaries: appends `out` to `df`, computing the
    * four stopword-hit counts as intermediate columns so the hit filters
    * evaluate once per row each. Codegen subexpression elimination SKIPS
    * higher-order-function subtrees (lambda-bound), so the one-Column
    * [[langId]] re-runs the split+filter per reference — ~10 evaluations
    * per row through the when-chain; measured 2.3× slower than this form
    * on the bench corpus. CollapseProject cannot re-inline the staging:
    * every staged column is non-cheap and referenced more than once.
    * Values identical to [[langId]] (LangIdStagedSpec pins it).
    */
  def langIdFromWords(df: org.apache.spark.sql.DataFrame, wsCol: String,
                      out: String): org.apache.spark.sql.DataFrame = {
    val langs = Seq("de", "en", "es", "fr")
    def hc(l: String) = s"__${out}_hits_$l"
    val withHits = langs.foldLeft(df)((d, l) =>
      d.withColumn(hc(l), stopwordHits(col(wsCol), stopwords(l))))
    val s = langs.map(l => col(hc(l)))
    withHits.withColumn(out,
        when(coalesce(s(0) + s(1) + s(2) + s(3), lit(0)) === 0, lit("und"))
          .when(s(0) >= s(1) && s(0) >= s(2) && s(0) >= s(3), lit("de"))
          .when(s(1) >= s(2) && s(1) >= s(3), lit("en"))
          .when(s(2) >= s(3), lit("es"))
          .otherwise(lit("fr")))
      .drop(langs.map(hc): _*)
  }

  /** [[qualityScore]] over a PRE-MATERIALIZED token-array column — same
    * staging rationale as [[langIdFromWords]]: the one-Column form
    * re-splits the text for every reference (token count ×3, stopword
    * hits, the zero guard). Values identical to [[qualityScore]].
    */
  def qualityScoreFromWords(ws: Column): Column = {
    val nTokens = size(ws)
    val allStop = stopwords.values.flatten.toSeq.distinct.sorted
    when(coalesce(nTokens, lit(0)) === 0, lit(0.0))
      .otherwise(round(least(nTokens / lit(100.0), lit(1.0)) * lit(0.5) +
        stopwordHits(ws, allStop) * lit(1.0) / nTokens * lit(0.5), 4))
  }

  /** Document fingerprint: md5 over the sorted distinct token set — a
    * canonical-form hash that is invariant to token order and repetition.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** The t02 composite quality score, 4-dp rounded (engine-exact for
    * argmax/threshold comparisons): half length saturation at 100 tokens,
    * half all-language stopword ratio. A zero-token (or NULL) document
    * scores an explicit 0.0 — without the guard the stopword ratio is
    * double 0.0/0.0 = NaN, and NaN sorts ABOVE every real double in
    * Spark, so empty documents would WIN argmax survivor selection (and
    * diverge from DuckDB, whose division by zero yields NULL). Shared by
    * the quality query (t02) and cluster survivorship (d21) so the
    * formula cannot drift.
    */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val nTokens = size(ws)
    val allStop = stopwords.values.flatten.toSeq.distinct.sorted
    when(coalesce(nTokens, lit(0)) === 0, lit(0.0))
      .otherwise(round(least(nTokens / lit(100.0), lit(1.0)) * lit(0.5) +
        stopwordHits(ws, allStop) * lit(1.0) / nTokens * lit(0.5), 4))
  }

  /** Canonical URL for crawl dedup (the CCNet/RefinedWeb normalization
    * step: URL-level dedup runs before any content pass because it is
    * free — a row-local projection plus one hash shuffle): strip the
    * fragment, strip the scheme, drop `utm_*` tracking params, and
    * re-emit the surviving query params in sorted order so param
    * permutations collide. Pure codegen'd string/array builtins.
    */
  def canonicalUrl(url: Column): Column = {
    val base = regexp_replace(url, "#.*$", "")
    val hostPath = regexp_replace(regexp_replace(base, "\\?.*$", ""),
      "^https?://", "")
    val params = array_sort(filter(split(
        regexp_extract(base, "\\?(.*)$", 1), "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    concat(hostPath,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }
}
