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
}
