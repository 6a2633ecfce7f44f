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

  test("saltedJoin with chooseSalts' below-the-bar 0 is the plain join") {
    // chooseSalts legitimately returns 0; unguarded, pmod(h, 0) is NULL
    // (or an ANSI DIVIDE_BY_ZERO) and the join silently returned zero
    // rows — the natural composition must degrade to the plain join
    val big = Seq((1L, 10L), (2L, 20L), (1L, 30L)).toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Seq(0, 1).foreach { s =>
      val out = Skew.saltedJoin(big, small, Seq("k"), salts = s,
        bigUnique = col("payload"))
      assert(out.count() === 3L, s"salts=$s must behave as the plain join")
    }
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

  test("AutoSalts default: no-op at local partitioning, engages at cluster partitioning, lossless") {
    // the band joins now consume chooseSalts by DEFAULT (salts=AutoSalts)
    // instead of leaving the probe an opt-in helper. Two regimes, same
    // boilerplate corpus:
    //  - P=32 (local): a pure-duplicate corpus heats all nChunks chunk
    //    buckets equally, so c_max² ≤ W/nChunks and the crossover
    //    correctly stays at 0 — the auto plan must be the unsalted one
    //  - P=2048 (cluster-scale shuffle): a fair share shrinks 64×, the
    //    same histogram crosses the bar — auto must salt, and the pair
    //    set must be IDENTICAL (losslessness is the whole contract)
    import graft.operators.Dedup
    val sigs = Dedup.simhash(boilerplateDocs, "doc_id", "text")
      .localCheckpoint()
    val plain = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 4, salts = 0)
    val auto32 = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 4)
    assert(!auto32.queryExecution.executedPlan.toString.contains("__salt"),
      "auto must resolve to 0 below the crossover (AQE stays the mitigation)")
    assert(auto32.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(auto32).count() === 0)
    val p0 = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", 2048)
      val autoBig = Dedup.simhashPairs(sigs, "doc_id", maxHamming = 4)
      assert(autoBig.queryExecution.executedPlan.toString.contains("__salt"),
        "auto must engage once the partition count makes the bucket hot")
      assert(autoBig.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(autoBig).count() === 0)
      // lshCandidates rides the same resolver
      val mhSigs = Dedup.minhashSignatures(boilerplateDocs, "doc_id", "text")
        .localCheckpoint()
      val lshAuto = Dedup.lshCandidates(mhSigs, "doc_id")
      assert(lshAuto.queryExecution.executedPlan.toString.contains("__salt"))
      val lshPlain = Dedup.lshCandidates(mhSigs, "doc_id", salts = 0)
      assert(lshAuto.exceptAll(lshPlain).count() === 0)
      assert(lshPlain.exceptAll(lshAuto).count() === 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p0)
  }

  test("chooseSalts: crossover rule from the bucket histogram (both overloads)") {
    // below the bar: the SaltProbe-measured 10× shape scaled down — top
    // bucket ~3× a fair partition share, salting measured NEGATIVE there
    val probeShape = Seq(13428L, 12936L, 12135L, 11304L, 8486L) ++
      Seq.fill(2000)(900L)
    assert(Skew.chooseSalts(probeShape, partitions = 32) === 0)
    // uniform histogram: never salt
    assert(Skew.chooseSalts(Seq.fill(100)(1000L), partitions = 32) === 0)
    // empty: no decision to make
    assert(Skew.chooseSalts(Seq.empty, partitions = 32) === 0)
    // the boilerplate regime: one bucket carries nearly all the square
    // work — c_max²≈2.5e11 vs fair=(2.5e11+1e4)/32, ratio≈32 → bar=16
    // exceeded; magnitude = half the bar-clearing factor, floored at 2
    // (the round-13 calibration: the exact-bar s measured no better
    // than unsalted, half of it won)
    val boiler = Seq(500000L) ++ Seq.fill(100)(10L)
    assert(Skew.chooseSalts(boiler, partitions = 32) === 2)
    // more partitions make the same hot bucket relatively hotter:
    // fair share shrinks ×32, ratio≈1024 → s=ceil(1024/32)=32
    assert(Skew.chooseSalts(boiler, partitions = 1024) === 32)
    // DataFrame overload agrees with the Seq form on the same histogram:
    // materialize bucketed ROWS with those counts and re-derive
    val rows = boiler.zipWithIndex.flatMap { case (c, k) =>
      (0L until c).map(i => (k.toLong, i))
    }.toDF("bucket", "row_id")
    assert(Skew.chooseSalts(rows, Seq("bucket"), partitions = 32,
      hotFactor = 16.0, maxSalts = 64) === 2)
    // and on an empty frame
    assert(Skew.chooseSalts(rows.limit(0), Seq("bucket"), partitions = 32,
      hotFactor = 16.0, maxSalts = 64) === 0)
  }
}
