package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The staged langId/qualityScore forms (TextFns.langIdFromWords /
  * qualityScoreFromWords — projection-materialized token arrays, added
  * because codegen CSE skips higher-order-function subtrees and the
  * one-Column forms re-split the text per reference) must be VALUE-
  * identical to the one-Column forms on the real corpus: the oracles of
  * t01/t02/t14/d21/d24/d25/d26 pin the one-Column semantics, so any
  * drift here is an oracle break waiting at a bigger SF.
  */
class LangIdStagedSpec extends SparkSpec {

  test("staged langId == one-Column langId on the corpus") {
    val d = Lake.table(spark, sf, "documents")
    val one = d.select(col("doc_id"),
      TextFns.langId(col("text")).as("pred"))
    val staged = TextFns.langIdFromWords(
        d.select(col("doc_id"), TextFns.words(col("text")).as("__ws")),
        "__ws", "pred")
      .select("doc_id", "pred")
    assert(one.exceptAll(staged).isEmpty, "one-Column rows missing in staged")
    assert(staged.exceptAll(one).isEmpty, "staged rows missing in one-Column")
  }

  test("staged qualityScore == one-Column qualityScore on the corpus") {
    val d = Lake.table(spark, sf, "documents")
    val one = d.select(col("doc_id"),
      TextFns.qualityScore(col("text")).as("q"))
    val staged = d
      .select(col("doc_id"), TextFns.words(col("text")).as("__ws"))
      .select(col("doc_id"), TextFns.qualityScoreFromWords(col("__ws")).as("q"))
    assert(one.exceptAll(staged).isEmpty, "one-Column rows missing in staged")
    assert(staged.exceptAll(one).isEmpty, "staged rows missing in one-Column")
  }

  test("null text: staged langId stays 'und' and quality stays 0.0") {
    import spark.implicits._
    val d = Seq((1L, null: String), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val staged = TextFns.langIdFromWords(
        d.select(col("doc_id"), TextFns.words(col("text")).as("__ws")),
        "__ws", "pred")
      .select(col("doc_id"), col("pred"),
        TextFns.qualityScoreFromWords(col("__ws")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val one = d.select(col("doc_id"), TextFns.langId(col("text")).as("pred"),
        TextFns.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(staged.toSeq === one.toSeq)
  }
}
