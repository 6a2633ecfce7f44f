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
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   "), (4L, "x"))
      .toDF("doc_id", "text")
    val ids = Dedup.simhash(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 4L))
  }

  test("native simhash is a narrow projection: no exchange, no generate") {
    val docs = Lake.table(spark, sf, "documents")
    val plan = Dedup.simhash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "simhash must not shuffle")
    assert(!plan.contains("Generate"), "simhash must not explode tokens")
  }
}
