package graft

import graft.operators.Bpe

/** BPE merge training: pair argmax, tie rule, non-overlapping merge. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merges on a tiny corpus") {
    // "low low low lower newest newest" — 'lo' is the most frequent pair
    val docs = Seq("low low low lower", "newest newest").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // step 1: (l,o) and (o,w) both appear 4x; tie -> lexicographically
    // smaller left symbol wins
    assert(m(0) === ((1, "l", "o", "lo", 4L)))
    // step 2: after merging 'lo', (lo,w) appears 4x and wins the 3x pairs
    assert(m(1) === ((2, "lo", "w", "low", 4L)))
  }

  test("merge application is left-to-right non-overlapping") {
    // 'aaaa' repeated: pair (a,a) freq = 3 per word occurrence; after one
    // merge the word is [aa, aa], so step 2 must learn (aa, aa), not (a, a)
    val docs = Seq("aaaa aaaa b").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m(0) === ((1, "aa", 6L)))
    assert(m(1) === ((2, "aaaa", 2L)))
  }

  test("stops early when every word is fully merged") {
    // after step 1 merges (a,b), the only multi-char word is a single
    // symbol — no pairs remain, so step 2 is skipped, not a crash
    val docs = Seq("a b c a b ab").toDF("text")
    val m = Bpe.train(docs, "text", steps = 2).orderBy("step").collect()
    assert(m.length === 1)
    assert(m(0).getString(3) === "ab")
  }
}
