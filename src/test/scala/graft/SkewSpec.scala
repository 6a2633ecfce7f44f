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

  // ------------- salted near-dup band joins (boilerplate-heavy corpus)

  /** 250 of 300 docs share one exact boilerplate text — one hot simhash,
    * so EVERY (chunk_idx, chunk_val) / band hash of it is a hot join key:
    * the synthetic form of the boilerplate-heavy lake where the near-dup
    * self-joins skew.
    */
  private def boilerplateDocs = (0 until 300).map { i =>
    if (i < 250)
      (i.toLong,
        "the same boilerplate footer text repeated on every page of the site")
    else
      (i.toLong, s"unique document number $i words w${i * 7} w${i * 13} " +
        s"w${i * 29} tail$i")
  }.toDF("doc_id", "text")

  test("salted simhashPairs == plain on a boilerplate-heavy corpus") {
    import graft.operators.Dedup
    val sigs = Dedup.simhash(boilerplateDocs, "doc_id", "text")
    val plain = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 4)
    val salted = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 4, salts = 8)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // the widened shuffle key is in the physical plan
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("salted lshCandidates == plain, and the salt SPREADS the hot key") {
    import graft.operators.Dedup
    val sigs = Dedup.minhashSignatures(boilerplateDocs, "doc_id", "text")
      .localCheckpoint()
    val plain = Dedup.lshCandidates(sigs, "doc_id")
    val salted = Dedup.lshCandidates(sigs, "doc_id", salts = 8)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // no-straggler evidence at the shuffle-key level: the hottest
    // (band_hash) group holds the 250 boilerplate docs; under the salt it
    // splits into ≥4× smaller (band_hash, salt) groups — the reducer-side
    // row bound that decides whether one task drags the stage
    val plainMax = sigs.groupBy("band_0").count()
      .agg(max("count")).head.getLong(0)
    val saltedMax = sigs
      .select(col("band_0"),
        pmod(xxhash64(col("doc_id")), lit(8L)).as("s"))
      .groupBy("band_0", "s").count()
      .agg(max("count")).head.getLong(0)
    assert(plainMax >= 250L)
    assert(saltedMax <= plainMax / 4,
      s"hot key must spread ≥4x under 8 salts ($plainMax -> $saltedMax)")
  }
}
