package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Native one-pass Simhash60 vs the exploded aggregation reference. */
class SimhashSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash == exploded-agg simhash on real docs") {
    val docs = Lake.table(spark, sf, "documents")
    val native = Dedup.simhash(docs, "doc_id", "text")
    val agg = Dedup.simhashAgg(docs, "doc_id", "text")
    assert(native.count() === agg.count())
    assert(native.exceptAll(agg).count() === 0)
  }

  test("token-less docs produce no row, matching the exploded form") {
    // includes NON-SPACE whitespace-only docs: the gate trims the full
    // Ws class — bare trim strips only ASCII space, so a "\n"-only doc
    // would slip through as a spurious signature-0 row and every such
    // doc would pair as a hamming-0 near-dup of the others, while the
    // exploded form (and the oracle) emit no row at all
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   "), (4L, "x"),
        (5L, "\n\t"), (6L, " \r\n "), (7L, "\n word \n"))
      .toDF("doc_id", "text")
    val ids = Dedup.simhash(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 4L, 7L))
    val aggIds = Dedup.simhashAgg(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(aggIds === ids, "gate must match the exploded form exactly")
  }

  test("native simhash is a narrow projection: no exchange, no generate") {
    val docs = Lake.table(spark, sf, "documents")
    val plan = Dedup.simhash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "simhash must not shuffle")
    assert(!plan.contains("Generate"), "simhash must not explode tokens")
  }
}
