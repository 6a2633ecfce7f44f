package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The native Md5PrefixLong expression must be bit-identical to the
  * built-in `conv(substring(md5(c), 1, n), 16, 10)` composition it
  * replaces (which is what the DuckDB oracle computes).
  */
class Md5PrefixSpec extends SparkSpec {

  test("hash28/hash60 == conv-substring-md5 composition on real text") {
    val words = Lake.table(spark, sf, "documents")
      .select(explode(TextFns.words(col("text"))).as("w")).limit(20000)
    val cmp = words.select(
      TextFns.hash28(col("w")).as("fast28"),
      conv(substring(md5(col("w")), 1, 7), 16, 10).cast("long").as("ref28"),
      TextFns.hash60(col("w")).as("fast60"),
      conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("ref60"))
    assert(cmp.filter(col("fast28") =!= col("ref28") ||
      col("fast60") =!= col("ref60")).count() === 0)
  }

  test("single-block fast path sweeps the 55/56-byte boundary and multibyte") {
    import spark.implicits._
    // every length 0..80 (covers fast->MessageDigest switch at 55 bytes),
    // plus multibyte strings where byte length != char length
    val inputs =
      (0 to 80).map(n => "ab7".*(27).substring(0, n)) ++
        Seq("café", "日本語テキスト", "aé" * 30, "ü" * 28)
    val cmp = inputs.toDF("w").select(
      TextFns.hash60(col("w")).as("fast"),
      conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }
}
