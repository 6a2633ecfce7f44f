package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: identical result to the plain join; shuffle key widened. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join on a skewed key") {
    // 90% of lineitem rows share one hot supplier key
    val big = Lake.table(spark, sf, "lineitem")
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit(1L))
        .otherwise(col("l_suppkey")))
      .select("k", "l_orderkey", "l_linenumber")
    val small = Seq((1L, "hot"), (2L, "cold"), (7L, "warm")).toDF("k", "v")

    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8,
      bigUnique = col("l_orderkey") * 10 + col("l_linenumber"))

    assert(salted.count() === plain.count())
    assert(salted.select("k", "l_orderkey", "l_linenumber", "v")
      .exceptAll(plain.select("k", "l_orderkey", "l_linenumber", "v"))
      .count() === 0)
  }
}
