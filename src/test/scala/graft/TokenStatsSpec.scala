package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge => B}
import graft.functions.TextFns
import graft.plans.{TokenCounts, TokenStats}

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

  test("TokenCounts == regex reference on all three counters") {
    // edge shapes beyond the lake rows: uppercase is BOTH a bpe token
    // and punct (it falls in [^a-z0-9\s]); newline/tab are SEPARATORS
    // (the Ws contract — same class the words() split uses); digit/letter
    // run boundaries; multi-byte code points count once
    val t = texts.union(Seq(
      (9101L, "abc123def"), (9102L, "A B\tC\nD"), (9103L, "a,b;c!?"),
      (9104L, "héllo wörld"), (9105L, "1 22 333 a1b2"))
      .toDF("doc_id", "text"))
    val regex = t.select(col("doc_id"),
      size(TextFns.words(col("text"))).as("n_ws_tokens"),
      // explicit Ws class, not Java \s: the mirror must match the RE2
      // class the DuckDB oracle evaluates (no \v)
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"), lit(0)))
        .as("n_bpe_tokens"),
      length(regexp_replace(col("text"), "[a-z0-9 \\t\\n\\f\\r]", ""))
        .as("n_punct"))
    val native = t.select(col("doc_id"),
        B.column(TokenCounts(B.expression(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.n_ws_tokens"), col("tc.n_bpe_tokens"),
        col("tc.n_punct"))
    val r = regex.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val nv = native.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(r.keySet === nv.keySet)
    r.foreach { case (id, v) => assert(nv(id) === v, s"doc_id=$id") }
  }

  test("TokenCounts keeps replacement-char classification on invalid UTF-8") {
    // the regex mirror decodes through String (each stray/invalid byte →
    // one U+FFFD = one "other"); the native byte scan must classify the
    // same way: a continuation byte is "same code point" only while a
    // lead still expects one
    val rows = Seq(
      9201L -> Array[Byte]('a', 0x80.toByte, 'b'),          // stray continuation
      9202L -> Array[Byte]('a', 0xF8.toByte, 'b'),          // invalid lead
      9203L -> Array[Byte]('a', ' ', 0xC3.toByte),          // truncated seq at end
      9204L -> Array[Byte](0xC3.toByte, 0xA9.toByte, 0xA9.toByte, 'x'), // é + excess cont
      9205L -> Array[Byte](0xE2.toByte, 0x82.toByte, 'a'),  // truncated 3-byte prefix
      9206L -> Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte), // all stray
      9207L -> Array[Byte]('a', 0xC0.toByte, 0x80.toByte, 'b'), // overlong lead: 2 FFFDs
      9208L -> Array[Byte](0xF5.toByte, 0x80.toByte, 'x'))  // beyond-range lead: 2 FFFDs
    val t = rows.toDF("doc_id", "b")
      .select(col("doc_id"), col("b").cast("string").as("text"))
    val regex = t.select(col("doc_id"),
      size(TextFns.words(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"), lit(0)))
        .as("n_bpe_tokens"),
      length(regexp_replace(col("text"), "[a-z0-9 \\t\\n\\f\\r]", ""))
        .as("n_punct"))
    val native = t.select(col("doc_id"),
        B.column(TokenCounts(B.expression(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.n_ws_tokens"), col("tc.n_bpe_tokens"),
        col("tc.n_punct"))
    val r = regex.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val nv = native.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(r.keySet === nv.keySet)
    r.foreach { case (id, v) => assert(nv(id) === v, s"doc_id=$id") }
  }
}
