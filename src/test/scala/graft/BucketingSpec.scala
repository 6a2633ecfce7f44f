package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the shuffle entirely — the physical plan must contain no
  * Exchange. This is the 100 TB strategy for the tags/assets tables
  * (bucket by asset_uri) called out in TagStore's scaladoc.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without Exchange") {
    val o = Lake.table(spark, sf, "orders")
    val li = Lake.table(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // DROP above only clears this JVM's in-memory catalog; the managed
    // locations under the (fixed, reused) warehouse dir survive across
    // runs and CREATE fails on LOCATION_ALREADY_EXISTS without this
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // at this sf orders is broadcast-sized, which would bypass the buckets;
    // disable auto-broadcast to exercise the co-located path under test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.collect().length > 0) // execute THIS QueryExecution (count() builds another)
      // post-AQE final plan: a co-located bucketed join has NO Exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
