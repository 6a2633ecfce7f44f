package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{CosineSimilarity, LongSetIntersectSize, Md5PrefixLong,
  ShingleHashSet, Simhash60, TokenCounts, WordNgrams}

/** Library entry point for `spark.sql.extensions`: installs the engine's
  * native expressions into every session's function registry, so SQL-only
  * users get them with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and zero code:
  *
  *   SELECT graft_cosine_sim(a.vec, b.vec)   -- codegen'd fused loop
  *   SELECT graft_md5_prefix(text, 7)        -- digest-bytes → BIGINT hash
  *   SELECT graft_simhash(text)              -- one-pass 60-bit simhash
  *   SELECT graft_set_intersect_size(a, b)   -- |A∩B| over long-array sets
  *   SELECT graft_word_ngrams(text, 5)       -- distinct hashed word 5-grams
  *   SELECT graft_token_counts(text)         -- ws/BPE-ish/punct counters, one scan
  *   SELECT graft_shingle_set(text, 5)       -- distinct hashed char-5 shingles
  *
  * (The Column API in [[graft.functions.VectorFns]]/[[graft.functions.TextFns]]
  * does not need this — it builds the expressions directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_cosine_sim(arrayA, arrayB)")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_prefix"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5_prefix"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_md5_prefix(col, nibbles)")
        val nibbles = exprs(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Integer, _) => v.intValue
          case other => throw new IllegalArgumentException(
            s"graft_md5_prefix nibbles must be an integer literal, got $other")
        }
        Md5PrefixLong(exprs.head, nibbles)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash60].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_simhash(text)")
        Simhash60(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_set_intersect_size"),
      new ExpressionInfo(classOf[LongSetIntersectSize].getName,
        "graft_set_intersect_size"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_set_intersect_size(arrayA, arrayB)")
        LongSetIntersectSize(exprs.head, exprs(1))
      }))
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case Literal(v: Integer, _) => v.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_word_ngrams(text, n)")
        WordNgrams(exprs.head, intLit(exprs(1), "graft_word_ngrams n"),
          distinct = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_token_counts(text)")
        TokenCounts(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleHashSet].getName, "graft_shingle_set"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_shingle_set(text, k)")
        ShingleHashSet(exprs.head, intLit(exprs(1), "graft_shingle_set k"))
      }))
  }
}
