package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.functions.TextFns
import graft.plans.TokenStats

/** The native one-pass token-stats expression must agree with the
  * Column-composed HOF forms on every counter.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private def texts = Lake.table(spark, sf, "documents")
    .select("doc_id", "text").union(Seq(
      (9001L, ""), (9002L, "a"), (9003L, "a a"), (9004L, "a  b   a"),
      (9005L, " leading trailing "), (9006L, "x y x y x"))
      .toDF("doc_id", "text"))

  test("TokenStats == HOF reference on all five counters") {
    val ws = col("ws")
    val grams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    val hof = texts
      .select(col("doc_id"), TextFns.words(col("text")).as("ws"))
      .select(col("doc_id"), size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_distinct"),
        coalesce(array_max(transform(array_distinct(ws),
          d => size(filter(ws, x => x === d)))), lit(0)).as("top_count"),
        size(grams).as("n_grams"),
        size(array_distinct(grams)).as("n_distinct_grams"))
    val native = texts.select(col("doc_id"),
        B.column(TokenStats(B.expression(col("text")))).as("ts"))
      .select(col("doc_id"), col("ts.n_tokens"), col("ts.n_distinct"),
        col("ts.top_count"), col("ts.n_grams"), col("ts.n_distinct_grams"))
    val h = hof.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val nv = native.collect().map(r => r.getLong(0) ->
      (r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt,
        r.getLong(4).toInt, r.getLong(5).toInt)).toMap
    assert(h.keySet === nv.keySet)
    h.foreach { case (id, v) => assert(nv(id) === v, s"doc_id=$id") }
  }
}
