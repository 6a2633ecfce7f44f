package graft

import graft.functions.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("capacity above cardinality → exact counts via map-side-merged sketch") {
    val data = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val out = spark.createDataset(data).repartition(4)
      .select(new HeavyHitters(100).toColumn)
      .head()
    val top = out.take(3)
    assert(top === Seq(("w50", 50L), ("w49", 49L), ("w48", 48L)))
    assert(out.length === 50)
  }

  test("capacity below cardinality → top items survive with bounded overestimate") {
    // 5 heavy keys (1000 each) + 200 singleton keys, shuffled deterministically
    val heavy = (1 to 5).flatMap(i => Seq.fill(1000)(s"H$i"))
    val noise = (1 to 200).map(i => s"n$i")
    val data = new scala.util.Random(42).shuffle(heavy ++ noise)
    val out = spark.createDataset(data).repartition(4)
      .select(new HeavyHitters(32).toColumn)
      .head()
    assert(out.length <= 32)
    val got = out.toMap
    (1 to 5).foreach { i =>
      val c = got.getOrElse(s"H$i", 0L)
      // true count 1000; space-saving never undercounts below merge cuts
      // and overestimates by at most the evicted minimum (here ≤ ~noise)
      assert(c >= 1000L && c <= 1250L, s"H$i -> $c")
    }
  }

  test("mergeable guarantee: a key evicted on one side is never undercounted") {
    // Partition A: H appears 5 times then is evicted by 8 heavier local
    // keys (capacity 8). Partition B: H appears 100 times and survives.
    // True total = 105. A merge that just sums per-key counts reports
    // H = 100 — an undercount that can demote the true heaviest key. The
    // mergeable merge charges H with A's absent-key bound (its min
    // counter, ≥ H's true count there), so stored ≥ true must hold for
    // every reported key.
    val partA = Seq.fill(5)("H") ++
      (1 to 7).flatMap(i => Seq.fill(52 - 2 * i)(s"a$i")) ++ Seq.fill(20)("a8")
    val partB = Seq.fill(100)("H") ++ (1 to 7).flatMap(i => Seq.fill(30)(s"b$i"))
    val rdd = spark.sparkContext
      .parallelize(Seq(partA, partB), 2).flatMap(identity)
    val out = spark.createDataset(rdd)
      .select(new HeavyHitters(8).toColumn)
      .head()
    val truth = (partA ++ partB).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(out.nonEmpty && out.length <= 8)
    out.foreach { case (k, c) =>
      assert(c >= truth(k), s"$k stored $c undercounts true ${truth(k)}")
    }
    val h = out.toMap.getOrElse("H", 0L)
    assert(h >= 105L, s"split hitter H must be >= its true 105, got $h")
  }

  test("merging an empty zero-error buffer is an identity, not an err inflation") {
    // empty partial buffers are routine (one per empty partition); before
    // the identity short-circuit, zero ⋈ full set err to the full side's
    // absent-key bound, and every LATER merge charged absent keys with
    // that inflated bound — valid but needlessly loose
    val agg = new HeavyHitters(4)
    val full = Seq.fill(10)("x") ++ Seq.fill(7)("y") ++
      Seq.fill(3)("z") ++ Seq.fill(2)("w")
    val b = full.foldLeft(agg.zero)(agg.reduce)
    assert(b.counts.size === 4 && b.err === 0L)
    val viaLeft = agg.merge(agg.zero, b)
    assert(viaLeft.err === 0L)
    assert(viaLeft.counts.toMap === b.counts.toMap)
    val viaRight = agg.merge(b, agg.zero)
    assert(viaRight.err === 0L)
    assert(viaRight.counts.toMap === b.counts.toMap)
  }
}
