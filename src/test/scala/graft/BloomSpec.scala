package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Bloom-filter membership pruning: lossless two-phase novelty check. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("build leaves the session runtime-filter ceilings untouched") {
    // the ceilings clamp the optimizer's auto-injected runtime bloom
    // filters; the build must not touch the CALLER's session at all (a
    // raise-and-restore would leak the raised values to every
    // concurrently planned query in the session) — it raises them in a
    // private child session instead, and the sketch asked for must come
    // back unclamped past the 4M/67M defaults
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    val before = keys.map(spark.conf.get(_))
    // one partition → one aggregation buffer of numBits/8 bytes
    val corpus = (0L until 100L).map(i => s"k$i").toDF("k").coalesce(1)
    // request above the default 4M-item / 67M-bit ceilings
    val bf = Bloom.build(corpus, col("k"), expectedItems = 5000000L,
      numBits = 80000000L)
    // the sketch built is the sketch asked for: 80M bits ≈ 10 MB of
    // serialized bitset — a silent clamp to the 67M-bit ceiling would
    // come back ≈ 8.4 MB
    assert(bf.length > 80000000 / 8)
    assert(keys.map(spark.conf.get(_)) === before)
  }

  test("no false negatives: bloom-negative keys are truly absent") {
    val corpus = (0L until 2000L).map(i => s"key_$i").toDF("k")
    val bf = Bloom.build(corpus, col("k"), expectedItems = 10000L,
      numBits = 80000L)
    val probes = (1500L until 3000L).map(i => s"key_$i").toDF("k")
    val negatives = probes.filter(!Bloom.mightContain(bf, col("k")))
    // a bloom-negative must never be in the corpus
    assert(negatives.join(corpus, Seq("k"), "left_semi").count() === 0)
    // every true member must probe positive (no false negatives)
    val members = probes.join(corpus, Seq("k"), "left_semi")
    assert(members.filter(!Bloom.mightContain(bf, col("k"))).count() === 0)
  }

  test("two-phase novelty == exact anti-join") {
    val corpus = (0L until 1000L).filter(_ % 3 != 0).map(i => s"v$i").toDF("k")
    val batch = (0L until 1000L).map(i => s"v$i").toDF("k")
    val bf = Bloom.build(corpus, col("k"), 10000L, 80000L)
    val flagged = batch.withColumn("cand", Bloom.mightContain(bf, col("k")))
    val novel = flagged.filter(!col("cand")).select("k")
      .union(flagged.filter(col("cand"))
        .join(corpus, Seq("k"), "left_anti").select("k"))
    val exact = batch.join(corpus, Seq("k"), "left_anti")
    assert(novel.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(novel).count() === 0)
  }

  test("empty corpus: null sketch probes false, everything is novel") {
    val corpus = Seq.empty[String].toDF("k")
    val bf = Bloom.build(corpus, col("k"), 1000L, 8000L)
    assert(bf === null) // the aggregate yields a null sketch on zero rows
    val batch = (0L until 100L).map(i => s"v$i").toDF("k")
    val flagged = batch.withColumn("cand", Bloom.mightContain(bf, col("k")))
    // two-phase == anti-join must hold on the empty edge too: no
    // candidates, every row novel (a raw might_contain(null,…) probe
    // would return SQL NULL and drop every row from both branches)
    assert(flagged.filter(col("cand")).count() === 0)
    val novel = flagged.filter(!col("cand")).select("k")
      .union(flagged.filter(col("cand"))
        .join(corpus, Seq("k"), "left_anti").select("k"))
    assert(novel.count() === batch.count())
  }

  test("the probe is a scan-side predicate, not a join") {
    // parquet-backed input: a local relation would be constant-folded
    // through the probe by ConvertToLocalRelation and prove nothing
    val docs = Lake.table(spark, sf, "documents")
    val corpus = (0L until 100L).map(i => s"c$i").toDF("k")
    val bf = Bloom.build(corpus, col("k"), 1000L, 8000L)
    val plan = docs.filter(!Bloom.mightContain(bf, md5(col("text"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    assert(!plan.toLowerCase.contains("join"))
  }
}
